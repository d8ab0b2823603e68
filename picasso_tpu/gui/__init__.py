"""picasso_tpu.gui — interactive viewers.

The reference ships ~30k lines of PyQt6 apps (picasso/gui/); since
v0.10 all analysis logic lives outside the GUI (reference
changelog.md:60-66), and picasso-tpu keeps that contract: every
operation is available headlessly via the API/CLI, and all outputs are
file-compatible with the reference GUI apps.

This package provides lightweight matplotlib-based viewers
(render viewer with pan/zoom/picking, localize preview, filter) that
run on any matplotlib backend. A full Qt front-end can be layered on
top of the same API later; nothing in the core imports Qt.
"""

from picasso_tpu.gui.viewers import (  # noqa: F401
    FilterApp,
    LocalizeApp,
    RenderApp,
)
from picasso_tpu.gui.panels import (  # noqa: F401
    ChannelsPanel,
    DisplaySettingsPanel,
    InfoPanel,
)
from picasso_tpu.gui.apps import (  # noqa: F401
    Average3App,
    AverageApp,
    DesignApp,
    NanotronApp,
    RotationApp,
    SimulateApp,
    SpinnaApp,
    ToRawApp,
)
