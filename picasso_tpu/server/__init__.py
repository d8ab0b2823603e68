"""picasso_tpu.server — monitoring server over the localization
summary database (capability parity with picasso/server/: a Streamlit
shell routing to Status/History/Compare/Watcher/Preview pages backed by
the SQLite DB written by ``localize.add_file_to_db``).

The data/query layer (``history``, ``status``, ``compare``,
``watcher``) is plain Python over sqlite3 and is fully usable headless;
the Streamlit UI (``app``) is optional and gated on the ``streamlit``
package.
"""

STREAMLIT_AVAILABLE = True
try:  # pragma: no cover - environment dependent
    import streamlit  # noqa: F401
except ImportError:  # pragma: no cover
    STREAMLIT_AVAILABLE = False
