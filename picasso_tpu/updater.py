"""picasso_tpu.updater — PyPI version check + notification with
snooze/skip persistence (capability parity with picasso/updater.py:
get_latest_version :27, check_and_notify :138). Network failures are
swallowed — offline environments simply skip the check."""

from __future__ import annotations

import datetime
import json
import urllib.request

from picasso_tpu import __version__, io

_PYPI_URL = "https://pypi.org/pypi/picasso-tpu/json"
_SNOOZE_DAYS = 7


def get_latest_version(timeout: float = 3.0) -> str | None:
    """Latest released version on PyPI, or None if unreachable
    (picasso/updater.py:27)."""
    try:
        with urllib.request.urlopen(_PYPI_URL, timeout=timeout) as r:
            data = json.load(r)
        return data["info"]["version"]
    except Exception:
        return None


def _parse_version(v: str) -> tuple[int, ...]:
    parts = []
    for p in v.split("."):
        digits = "".join(c for c in p if c.isdigit())
        parts.append(int(digits) if digits else 0)
    return tuple(parts)


def check_for_update() -> str | None:
    """Return the newer version string if one exists, else None."""
    latest = get_latest_version()
    if latest is None:
        return None
    if _parse_version(latest) > _parse_version(__version__):
        return latest
    return None


def check_and_notify(notify=print) -> str | None:
    """Check for updates respecting the user's snooze/skip settings
    stored in ~/.picasso/settings.yaml (picasso/updater.py:138)."""
    settings = io.load_user_settings()
    upd = settings["Updater"]
    skipped = upd.get("Skipped version")
    snooze_until = upd.get("Snooze until")
    today = datetime.date.today().isoformat()
    if snooze_until and today < str(snooze_until):
        return None
    latest = check_for_update()
    if latest is None:
        return None
    if skipped == latest:
        return None
    notify(
        f"A new version of picasso-tpu is available: {latest} "
        f"(installed: {__version__})."
    )
    return latest


def snooze(days: int = _SNOOZE_DAYS) -> None:
    """Silence update notifications for the given number of days."""
    settings = io.load_user_settings()
    until = datetime.date.today() + datetime.timedelta(days=days)
    settings["Updater"]["Snooze until"] = until.isoformat()
    io.save_user_settings(settings)


def skip_version(version: str) -> None:
    """Never notify about this specific version again."""
    settings = io.load_user_settings()
    settings["Updater"]["Skipped version"] = version
    io.save_user_settings(settings)


# ---------------------------------------------------------------------------
# Granular helpers matching the reference surface (picasso/updater.py)
# ---------------------------------------------------------------------------

URL_GITHUB_REPO = "https://github.com/jungmannlab/picasso"
URL_LATEST_RELEASE = URL_GITHUB_REPO + "/releases/latest"
URL_LATEST_RELEASE_API = (
    "https://api.github.com/repos/jungmannlab/picasso/releases/latest"
)


def is_update_available() -> bool:
    return check_for_update() is not None


def get_update_url() -> str:
    return URL_LATEST_RELEASE


def should_check_today() -> bool:
    """True unless a check was already recorded today or updates are
    snoozed/disabled."""
    settings = io.load_user_settings()
    upd = settings["Updater"]
    if upd.get("Disabled"):
        return False
    today = datetime.date.today().isoformat()
    if upd.get("Last checked") == today:
        return False
    snooze_until_ = upd.get("Snooze until")
    if snooze_until_ and today < str(snooze_until_):
        return False
    return True


def mark_checked() -> None:
    settings = io.load_user_settings()
    settings["Updater"]["Last checked"] = (
        datetime.date.today().isoformat()
    )
    io.save_user_settings(settings)


def should_notify(version: str) -> bool:
    settings = io.load_user_settings()
    return settings["Updater"].get("Skipped version") != version


def snooze_until(date_iso: str) -> None:
    settings = io.load_user_settings()
    settings["Updater"]["Snooze until"] = date_iso
    io.save_user_settings(settings)


def disable_updates(disabled: bool = True) -> None:
    settings = io.load_user_settings()
    settings["Updater"]["Disabled"] = bool(disabled)
    io.save_user_settings(settings)


def cli_notify_update() -> None:
    """Console entry: check and print a notice if an update exists."""
    if should_check_today():
        check_and_notify(print)
        mark_checked()


def setup_gui_update_check(*args, **kwargs) -> None:
    """Qt hook kept for API compatibility; the TPU core ships no Qt,
    so this is the console check."""
    cli_notify_update()
