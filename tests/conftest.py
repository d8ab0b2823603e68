"""Shared fixtures for the picasso_tpu test suite.

Mirrors the reference test strategy (reference tests/conftest.py):
bundled-real-data fixtures, synthetic ground-truth Gaussian spot
factories (noiseless and Poisson-noised), and shared constants.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware; the env vars must be set
before jax is imported anywhere.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The streamed fused chain auto-routes over the mesh when >1 device is
# visible (production multi-chip behavior). On the 8-virtual-CPU test
# env that doubles every localize-path test's wall time for no extra
# signal, so default it off; dedicated tests (test_fused mesh-routing
# parity, test_parallel sharded-chain equivalence) opt back in.
os.environ.setdefault("PICASSO_TPU_FUSED_MESH", "off")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pandas as pd
import pytest

# The environment's TPU plugin re-registers itself ahead of the env
# var; force the CPU mesh explicitly so tests run on 8 virtual devices.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache: first-compile of the fit kernels is
# tens of seconds; cached compiles are instant across test runs. The
# package picks a host-fingerprinted dir (AOT blobs are machine code —
# a shared path would SIGILL or spam loader errors on other hosts).
import picasso_tpu  # noqa: F401  (sets jax_compilation_cache_dir)

_LOCAL_DATA = os.path.join(os.path.dirname(__file__), "data")
_REFERENCE_DATA = "/root/reference/tests/data"
# Bundled real data lives in the (read-only) reference mount; a local
# tests/data dir takes precedence if present.
DATA_DIR = (
    _LOCAL_DATA
    if os.path.exists(os.path.join(_LOCAL_DATA, "testdata.raw"))
    else _REFERENCE_DATA
)

# Shared constants (same values as the reference conftest :200-203).
CAMERA_INFO = {"Baseline": 0, "Sensitivity": 1, "Gain": 1}
BOX = 7
MIN_NG = 5000
PIXELSIZE = 130

# Real 3D astigmatism calibration (reference conftest :207-229).
CALIB_3D = {
    "X Coefficients": [
        -1.6680708772714857e-18,
        2.4038209829154137e-15,
        2.1771067332017187e-12,
        -3.0324788231238476e-09,
        3.5433326085494675e-06,
        0.0023039289366630425,
        1.2026032603707493,
    ],
    "Y Coefficients": [
        -1.7708672355491796e-18,
        9.808249540501714e-16,
        2.10653248543535e-12,
        2.228026137415219e-11,
        3.628007433361433e-06,
        -0.001646865504353452,
        1.2257249554338714,
    ],
    "Step size in nm": 5.0,
    "Number of frames": 201,
    "Magnification factor": 0.79,
}


@pytest.fixture(scope="session")
def locs_data():
    from picasso_tpu import io

    path = os.path.join(DATA_DIR, "testdata_locs.hdf5")
    if not os.path.isfile(path):
        pytest.skip(
            "bundled reference locs not available (parity data)"
        )
    return io.load_locs(path)


@pytest.fixture(scope="session")
def locs(locs_data):
    return locs_data[0]


@pytest.fixture(scope="session")
def info(locs_data):
    return locs_data[1]


@pytest.fixture(scope="session")
def movie_data(tmp_path_factory):
    from picasso_tpu import io

    path = os.path.join(DATA_DIR, "testdata.raw")
    if not os.path.isfile(path):
        # No bundled data: generate an equivalent synthetic movie with
        # our own simulator so the non-parity tests still run.
        from picasso_tpu import simulate

        movie, _, info = simulate.simulate_movie(
            n_sites=9, imagesize=32, frames=100, taud=3000,
            photonrate=55, seed=42,
        )
        d = tmp_path_factory.mktemp("simdata")
        path = str(d / "testdata.raw")
        simulate.saveMovie(path, movie, info)
    return io.load_movie(path)


@pytest.fixture(scope="session")
def movie(movie_data):
    return movie_data[0]


@pytest.fixture(scope="session")
def movie_info(movie_data):
    return movie_data[1]


# ---------------------------------------------------------------------------
# Synthetic Gaussian spots with known ground truth
# ---------------------------------------------------------------------------


def make_gaussian_spot(
    box: int,
    x0: float,
    y0: float,
    sx: float,
    sy: float,
    photons: float,
    bg: float,
) -> np.ndarray:
    """Noiseless 2D Gaussian spot; (x0, y0) are offsets from the box
    center pixel, matching the fitters' coordinate convention."""
    half = box // 2
    grid = np.arange(-half, half + 1, dtype=np.float64)
    gx = np.exp(-0.5 * ((grid - x0) / sx) ** 2) / (sx * np.sqrt(2 * np.pi))
    gy = np.exp(-0.5 * ((grid - y0) / sy) ** 2) / (sy * np.sqrt(2 * np.pi))
    return (photons * np.outer(gy, gx) + bg).astype(np.float32)


@pytest.fixture(scope="session")
def synthetic_spot_factory():
    def _factory(
        box: int = 7,
        x0: float = 0.0,
        y0: float = 0.0,
        sx: float = 1.0,
        sy: float = 1.0,
        photons: float = 5000.0,
        bg: float = 10.0,
        noise: bool = False,
        seed: int = 0,
    ) -> np.ndarray:
        spot = make_gaussian_spot(box, x0, y0, sx, sy, photons, bg)
        if noise:
            rng = np.random.default_rng(seed)
            spot = rng.poisson(np.maximum(spot, 0.0)).astype(np.float32)
        return spot

    return _factory


def _spot_batch(n: int, seed: int, photons_range, noise: bool):
    box = 7
    rng = np.random.default_rng(seed)
    gt = pd.DataFrame(
        {
            "x": rng.uniform(-0.5, 0.5, n),
            "y": rng.uniform(-0.5, 0.5, n),
            "sx": rng.uniform(0.9, 1.4, n),
            "sy": rng.uniform(0.9, 1.4, n),
            "photons": rng.uniform(*photons_range, n),
            "bg": rng.uniform(5.0, 30.0 if not noise else 20.0, n),
        }
    )
    spots = np.empty((n, box, box), dtype=np.float32)
    for i in range(n):
        clean = make_gaussian_spot(
            box, gt.x[i], gt.y[i], gt.sx[i], gt.sy[i],
            gt.photons[i], gt.bg[i],
        )
        spots[i] = (
            rng.poisson(np.maximum(clean, 0.0)).astype(np.float32)
            if noise
            else clean
        )
    return spots, gt


@pytest.fixture(scope="module")
def synthetic_spots():
    """(spots, ground_truth_df) for clean Gaussian spots."""
    return _spot_batch(64, 42, (2000.0, 8000.0), noise=False)


@pytest.fixture(scope="module")
def synthetic_spots_noisy():
    """(spots, ground_truth_df) with Poisson photon noise."""
    return _spot_batch(32, 123, (5000.0, 12000.0), noise=True)


@pytest.fixture(scope="session")
def real_identifications(movie):
    from picasso_tpu import localize

    return localize.identify(movie, MIN_NG, BOX, return_info=False)


@pytest.fixture(autouse=True)
def _close_matplotlib_figures():
    """GUI tests create figures per app; close them after every test so
    a long run never accumulates open figures (matplotlib warns at
    20+). Real sessions use the apps' close()/context-manager API."""
    yield
    import sys

    if "matplotlib.pyplot" in sys.modules:
        sys.modules["matplotlib.pyplot"].close("all")
