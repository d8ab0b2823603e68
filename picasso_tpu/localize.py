"""picasso_tpu.localize — spot identification, ROI extraction, photon
conversion and fit orchestration.

Same public surface as picasso/localize.py (identify :639,
identify_in_frame :295, get_spots :1115, fit2D :1344, localize :1682,
localize_3D :1818), but identification runs as one XLA program over
frame batches (picasso_tpu.ops.identify) instead of a ≤60-thread
work-stealing pool, and all fitters are batched TPU kernels.
"""

from __future__ import annotations

import warnings
from typing import Callable, Literal

import numpy as np
import pandas as pd

from picasso_tpu import __version__, avgroi, gausslq, gaussmle, lib
from picasso_tpu.ops import identify as _identify_ops

# Localization table column taxonomy (picasso/localize.py:52-71).
LOCALIZATION_COLUMNS = {
    "Base": [
        "frame",
        "x",
        "y",
        "photons",
        "sx",
        "sy",
        "bg",
        "lpx",
        "lpy",
        "ellipticity",
        "net_gradient",
    ],
    "3D only": ["z", "d_zcalib", "lpz"],
    "Picked spots only": ["n_id"],
    "MLE only": ["log_likelihood", "iterations"],
}
MEAN_COLS = LOCALIZATION_COLUMNS["Base"] + LOCALIZATION_COLUMNS["3D only"]
SET_COLS = [
    "Frames",
    "Height",
    "Width",
    "Box Size",
    "Min. Net Gradient",
    "Pixelsize",
]

# f32 bytes per identification device batch; frames-per-chunk adapts
# to the frame size so a 2048x2048 movie stages ~4 frames while small
# test movies batch hundreds. Sized so typical movies split into >=2
# chunks: the streamed path dispatches chunk k+1 while chunk k reads
# back (stream.identify_and_cut), which hides most of the host->device
# transfer behind compute.
_ID_CHUNK_BYTES = 64e6


def _id_frame_chunk(height: int, width: int) -> int:
    return int(
        np.clip(_ID_CHUNK_BYTES / (height * width * 4), 16, 1024)
    )


# ---------------------------------------------------------------------------
# Identification
# ---------------------------------------------------------------------------


def identify_in_image(
    image: np.ndarray, minimum_ng: float, box: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Identify local maxima + net gradients in one image
    (picasso/localize.py:248)."""
    _, y, x, ng = _identify_ops.identify_frames(
        np.asarray(image, np.float32)[None], minimum_ng, box
    )
    return y, x, ng


def identify_in_frame(
    frame: np.ndarray,
    minimum_ng: float,
    box: int,
    roi: tuple[tuple[int, int], tuple[int, int]] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Identify in one frame with optional ROI
    (picasso/localize.py:295)."""
    _, y, x, ng = _identify_ops.identify_frames(
        np.asarray(frame, np.float32)[None], minimum_ng, box, roi=roi
    )
    return y, x, ng


def identify_by_frame_number(
    movie,
    minimum_ng: float,
    box: int,
    frame_number: int,
    *,
    roi=None,
    frame_bounds=None,
    lock=None,
) -> pd.DataFrame:
    """Identify in one frame of a movie (picasso/localize.py:340).
    The ``lock`` argument is accepted for API compatibility."""
    if frame_bounds is not None:
        lo = frame_bounds[0] if frame_bounds[0] is not None else 0
        hi = frame_bounds[1] if frame_bounds[1] is not None else len(movie)
        lo = max(lo, 0)
        hi = min(hi, len(movie))
        if not (lo <= frame_number <= hi):
            return pd.DataFrame(
                {
                    "frame": pd.Series(dtype=int),
                    "x": pd.Series(dtype=int),
                    "y": pd.Series(dtype=int),
                    "net_gradient": pd.Series(dtype=np.float32),
                }
            )
    frame = np.asarray(movie[frame_number])
    y, x, ng = identify_in_frame(frame, minimum_ng, box, roi)
    return pd.DataFrame(
        {
            "frame": (frame_number * np.ones(len(x))).astype(int),
            "x": x.astype(int),
            "y": y.astype(int),
            "net_gradient": ng.astype(np.float32),
        }
    )


def identify(
    movie,
    minimum_ng: float,
    box: int,
    *,
    roi: tuple[tuple[int, int], tuple[int, int]] | None = None,
    frame_bounds: tuple[int, int] | None = None,
    threaded: bool = True,
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
    abort_callback: Callable[[], bool] | None = None,
    return_info: bool = False,
) -> pd.DataFrame | tuple[pd.DataFrame, dict]:
    """Identify spots in a whole movie (picasso/localize.py:639).

    Frames stream through the device in chunks; the ``threaded``
    argument is accepted for API compatibility (the TPU path is always
    batched)."""
    n_frames = len(movie)
    lo = 0
    hi = n_frames
    if frame_bounds is not None:
        # The reference evaluates per-frame ``lo <= f <= hi`` with
        # hi = min(bound, n_frames) (localize.py:394-401) — the upper
        # bound is inclusive.
        if frame_bounds[0] is not None:
            lo = max(frame_bounds[0], 0)
        if frame_bounds[1] is not None:
            hi = min(frame_bounds[1], n_frames)
    frames_idx = [f for f in range(n_frames) if lo <= f <= hi]

    def _empty_ids():
        return pd.DataFrame(
            {
                "frame": np.empty(0, int),
                "x": np.empty(0, int),
                "y": np.empty(0, int),
                "net_gradient": np.empty(0, np.float32),
            }
        )

    if not frames_idx:
        ids = _empty_ids()
        if return_info:
            return ids, {
                "Generated by": f"Picasso: v{__version__} Identify",
                "Min. Net Gradient": minimum_ng,
                "Box Size": box,
                "ROI": roi,
                "Frame Bounds": frame_bounds,
            }
        return ids
    frame_chunk = _id_frame_chunk(*np.asarray(movie[0]).shape)

    all_frames, all_y, all_x, all_ng = [], [], [], []
    with lib.progress_reporter(
        progress_callback, len(frames_idx), "Identifying spots"
    ) as rep:
        done = 0
        for start in range(0, len(frames_idx), frame_chunk):
            if abort_callback is not None and abort_callback():
                return None
            batch_idx = frames_idx[start:start + frame_chunk]
            if isinstance(movie, np.ndarray) or isinstance(
                movie, np.memmap
            ):
                batch = np.asarray(movie[batch_idx[0]:batch_idx[-1] + 1])
            else:
                batch = np.stack(
                    [np.asarray(movie[i]) for i in batch_idx]
                )
            # pad the tail chunk with zero frames so only one batch
            # shape ever compiles (zero frames have no local maxima and
            # net gradient 0, so they produce no hits; trim by frame
            # index below just in case)
            n_real = len(batch)
            pad = frame_chunk - n_real
            if pad > 0 and start > 0:
                batch = np.concatenate(
                    [batch, np.zeros((pad, *batch.shape[1:]),
                                     batch.dtype)]
                )
            f, y, x, ng = _identify_ops.identify_frames(
                batch,
                minimum_ng,
                box,
                frame_offset=batch_idx[0],
                roi=roi,
            )
            if pad > 0 and start > 0:
                keep = f < batch_idx[0] + n_real
                f, y, x, ng = f[keep], y[keep], x[keep], ng[keep]
            all_frames.append(f)
            all_y.append(y)
            all_x.append(x)
            all_ng.append(ng)
            done += len(batch_idx)
            rep.set_value(done)
            if callable(progress_callback):
                progress_callback(done)
    ids = pd.DataFrame(
        {
            "frame": np.concatenate(all_frames).astype(int),
            "x": np.concatenate(all_x).astype(int),
            "y": np.concatenate(all_y).astype(int),
            "net_gradient": np.concatenate(all_ng).astype(np.float32),
        }
    )
    ids.sort_values(by="frame", kind="stable", inplace=True)
    ids.reset_index(drop=True, inplace=True)
    if return_info:
        info = {
            "Generated by": f"Picasso: v{__version__} Identify",
            "Min. Net Gradient": minimum_ng,
            "Box Size": box,
            "ROI": roi,
            "Frame Bounds": frame_bounds,
        }
        return ids, info
    return ids


def picks_to_identifications(
    picks: list[tuple],
    *,
    n_frames: int | None = None,
    drift: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Convert circular picks to per-frame identifications for
    re-fitting picked positions (picasso/localize.py:752)."""
    data = {"frame": [], "x": [], "y": [], "net_gradient": [], "n_id": []}
    if n_frames is None and drift is not None:
        n_frames = len(drift)
    if n_frames is None:
        raise ValueError("Either n_frames or drift must be provided.")
    for n_id, (x0, y0) in enumerate(picks):
        frames = np.arange(n_frames)
        x = np.full(n_frames, x0, dtype=float)
        y = np.full(n_frames, y0, dtype=float)
        if drift is not None:
            x = x + drift["x"].to_numpy()
            y = y + drift["y"].to_numpy()
        data["frame"].extend(frames.tolist())
        data["x"].extend(np.round(x).astype(int).tolist())
        data["y"].extend(np.round(y).astype(int).tolist())
        data["net_gradient"].extend([0.0] * n_frames)
        data["n_id"].extend([n_id] * n_frames)
    return pd.DataFrame(data)


# ---------------------------------------------------------------------------
# ROI extraction + photon conversion
# ---------------------------------------------------------------------------


def get_spots(
    movie,
    identifications: pd.DataFrame,
    box: int,
    camera_info: dict,
) -> np.ndarray:
    """Cut (N, box, box) ROIs and convert to photon counts
    (picasso/localize.py:1115). For uint16 array-backed movies the
    gather and photon conversion fuse into one native pass."""
    from picasso_tpu import native

    ids_frame = identifications["frame"].to_numpy()
    ids_x = identifications["x"].to_numpy()
    ids_y = identifications["y"].to_numpy()
    if (
        native.AVAILABLE
        and (isinstance(movie, np.ndarray) or hasattr(movie, "__array__"))
        and np.isscalar(camera_info.get("Baseline", 0))
    ):
        movie_arr = np.asarray(movie)
        if (
            movie_arr.dtype == np.uint16
            and movie_arr.flags.c_contiguous
        ):
            return native.cut_spots_to_photons(
                movie_arr, ids_frame, ids_x, ids_y, box,
                camera_info["Baseline"],
                camera_info["Sensitivity"],
                camera_info["Gain"],
            )
    spots = _identify_ops.cut_spots_numpy(
        movie, ids_frame, ids_x, ids_y, box
    )
    return _identify_ops.to_photons(spots, camera_info)


def get_spots_raw(
    movie, identifications: pd.DataFrame, box: int
) -> np.ndarray:
    """Cut (N, box, box) ROIs in the movie's native dtype, without
    photon conversion — half the upload bytes for u16 movies when the
    fitters convert on device (photon_conversion=...)."""
    return _identify_ops.cut_spots_numpy(
        movie,
        identifications["frame"].to_numpy(),
        identifications["x"].to_numpy(),
        identifications["y"].to_numpy(),
        box,
    )


# ---------------------------------------------------------------------------
# Fitting orchestration
# ---------------------------------------------------------------------------


def fit2D(
    movie,
    movie_info: list[dict],
    camera_info: dict,
    identifications: pd.DataFrame,
    box: int,
    fitting_method: Literal[
        "gausslq", "gausslq-gpu", "gaussmle", "avg"
    ] = "gausslq",
    eps: float = 0.001,
    max_it: int = 100,
    mle_method: Literal["sigma", "sigmaxy"] = "sigmaxy",
    multiprocess: bool = True,
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
    abort_callback: Callable[[], bool] | None = None,
    spots: np.ndarray | None = None,
) -> tuple[pd.DataFrame | None, dict]:
    """Fit 2D localizations given identified spot positions
    (picasso/localize.py:1344). ``multiprocess`` is accepted for API
    compatibility; all methods run batched on device.

    ``spots`` optionally supplies pre-cut RAW (native-dtype) ROIs —
    e.g. from the streamed single-pass pipeline
    (picasso_tpu.stream.identify_and_cut) — so the movie is not read
    a second time; photon conversion still runs here (on device when
    eligible)."""
    assert isinstance(movie_info, list), "movie_info must be a list"
    assert isinstance(camera_info, dict), "camera_info must be a dict"
    assert isinstance(
        identifications, pd.DataFrame
    ), "identifications must be a DataFrame"
    assert isinstance(box, int) and box > 0, "box must be a positive integer"
    assert fitting_method in ("gausslq", "gausslq-gpu", "gaussmle", "avg")
    assert eps > 0 and max_it > 0
    assert mle_method in ("sigma", "sigmaxy")
    if "Pixelsize" not in camera_info:
        warnings.warn(
            "Camera info in fit2D does not contain 'Pixelsize'; "
            "assuming 130."
        )
        camera_info["Pixelsize"] = 130

    # Device-side photon conversion path: raw u16 ROIs upload at half
    # the bytes; (raw - baseline) * sensitivity / gain runs in HBM.
    conversion = None
    scalar_camera = (
        np.isscalar(camera_info.get("Baseline", 0))
        and np.isscalar(camera_info.get("Sensitivity", 1))
        and np.isscalar(camera_info.get("Gain", 1))
    )
    if spots is not None:
        # pre-cut raw ROIs (streamed pipeline): photon-convert on
        # device when eligible, else on host
        if (
            fitting_method in ("gausslq", "gausslq-gpu", "gaussmle")
            and scalar_camera
            and spots.dtype == np.uint16
        ):
            conversion = (
                float(camera_info["Baseline"]),
                float(camera_info["Sensitivity"])
                / float(camera_info["Gain"]),
            )
        else:
            spots = _identify_ops.to_photons(spots, camera_info)
    elif (
        fitting_method in ("gausslq", "gausslq-gpu", "gaussmle")
        and scalar_camera
        and getattr(
            np.asarray(movie[0]) if not isinstance(movie, np.ndarray)
            else movie, "dtype", None
        ) == np.uint16
    ):
        spots = get_spots_raw(movie, identifications, box)
        conversion = (
            float(camera_info["Baseline"]),
            float(camera_info["Sensitivity"])
            / float(camera_info["Gain"]),
        )
    else:
        spots = get_spots(movie, identifications, box, camera_info)
    em = camera_info["Gain"] > 1
    if abort_callback is not None and abort_callback():
        return None, {}
    if fitting_method in ("gausslq", "gausslq-gpu"):
        theta = gausslq.fit_spots(
            spots, progress_callback, photon_conversion=conversion
        )
        locs = gausslq.locs_from_fits(identifications, theta, box, em)
    elif fitting_method == "gaussmle":
        thetas, CRLBs, llhoods, iterations = gaussmle.gaussmle(
            spots, eps, max_it, mle_method, progress_callback,
            photon_conversion=conversion,
        )
        locs = gaussmle.locs_from_fits(
            identifications, thetas, CRLBs, llhoods, iterations, box
        )
    else:  # avg
        theta = avgroi.fit_spots(spots, progress_callback)
        locs = avgroi.locs_from_fits(identifications, theta, box, em)

    localize_info = {
        "Generated by": f"Picasso: v{__version__} Fit 2D",
        "Fit method": fitting_method,
    }
    if fitting_method == "gaussmle":
        localize_info["Convergence criterion"] = eps
        localize_info["Max iterations"] = max_it
    new_info = localize_info | camera_info
    return locs, new_info


# Deprecated aliases kept for API parity with the reference
# (picasso/localize.py:1148/1214).
def fit(movie, camera_info, identifications, box, eps=0.001, max_it=100,
        method="sigmaxy"):
    spots = get_spots(movie, identifications, box, camera_info)
    theta, CRLBs, likelihoods, iterations = gaussmle.gaussmle(
        spots, eps, max_it, method=method
    )
    return locs_from_fits(
        identifications, theta, CRLBs, likelihoods, iterations, box
    )


def fit_async(movie, camera_info, identifications, box, eps=0.001,
              max_it=100, method="sigmaxy"):
    """Deprecated MLE launcher returning (current, thetas, CRLBs,
    likelihoods, iterations) (picasso/localize.py:1214). The batched
    TPU fit completes eagerly; ``current`` is already at N."""
    lib.deprecation_warning(
        "Deprecation warning: this function will be removed in v0.11.0."
        " Use localize.fit2D instead."
    )
    spots = get_spots(movie, identifications, box, camera_info)
    return gaussmle.gaussmle_async(spots, eps, max_it, method=method)


def locs_from_fits(
    identifications, theta, CRLBs, likelihoods, iterations, box
) -> pd.DataFrame:
    """Legacy fit result assembly (picasso/localize.py:1281)."""
    y = theta[:, 0] + identifications["y"].to_numpy()
    x = theta[:, 1] + identifications["x"].to_numpy()
    lpy = np.sqrt(CRLBs[:, 0])
    lpx = np.sqrt(CRLBs[:, 1])
    locs = pd.DataFrame(
        {
            "frame": identifications["frame"].astype(np.uint32),
            "x": x.astype(np.float32),
            "y": y.astype(np.float32),
            "photons": theta[:, 2].astype(np.float32),
            "sx": theta[:, 5].astype(np.float32),
            "sy": theta[:, 4].astype(np.float32),
            "bg": theta[:, 3].astype(np.float32),
            "lpx": lpx.astype(np.float32),
            "lpy": lpy.astype(np.float32),
            "net_gradient": identifications["net_gradient"].astype(
                np.float32
            ),
            "likelihood": likelihoods.astype(np.float32),
            "iterations": iterations.astype(np.int32),
        }
    )
    locs.sort_values(by="frame", kind="quicksort", inplace=True)
    return locs


def localize(
    movie,
    camera_info: dict,
    parameters: dict,
    *,
    roi=None,
    frame_bounds=None,
    movie_info: list[dict] | None = None,
    fitting_method: Literal[
        "gausslq", "gausslq-gpu", "gaussmle", "avg"
    ] = "gausslq",
    eps: float = 0.001,
    max_it: int = 100,
    mle_method: Literal["sigma", "sigmaxy"] = "sigmaxy",
    threaded: bool = True,
    identification_progress_callback=None,
    fit_progress_callback=None,
    return_info: bool = False,
    perf: dict | None = None,
):
    """Identify + fit spots in 2D (picasso/localize.py:1682).

    Lazy (file-backed) movies stream through the single-pass
    identify+cut pipeline (picasso_tpu.stream): the next chunk decodes
    in a background thread while the device identifies the current
    one, and ROIs are cut from the in-RAM chunk — one decode pass
    instead of two, fixed host-memory footprint at any movie size."""
    if movie_info is None:
        movie_info = []
    spots = None
    scalar_camera = (
        np.isscalar(camera_info.get("Baseline", 0))
        and np.isscalar(camera_info.get("Sensitivity", 1))
        and np.isscalar(camera_info.get("Gain", 1))
    )
    if (
        fitting_method in ("gausslq", "gausslq-gpu", "gaussmle")
        and scalar_camera
    ):
        # Fully device-resident path: frames upload once (native
        # dtype); identify, ROI cut, photon conversion and the fit run
        # as one fused XLA program per chunk; only the compacted hit
        # list + fit results read back (ops/fused.py).
        from picasso_tpu.ops import fused as _fused

        if "Pixelsize" not in camera_info:
            warnings.warn(
                "Camera info in fit2D does not contain 'Pixelsize'; "
                "assuming 130."
            )
            camera_info["Pixelsize"] = 130
        identifications, fits = _fused.localize_fused(
            movie,
            parameters["Min. Net Gradient"],
            parameters["Box Size"],
            camera_info,
            fitting_method=fitting_method,
            eps=eps,
            max_it=max_it,
            mle_method=mle_method,
            roi=roi,
            frame_bounds=frame_bounds,
            progress_callback=identification_progress_callback,
            perf=perf,
        )
        if identifications is None:
            return None
        theta, crlb, ll, iters = fits
        box = parameters["Box Size"]
        em = camera_info["Gain"] > 1
        if fitting_method == "gaussmle":
            locs = gaussmle.locs_from_fits(
                identifications, theta, crlb, ll, iters, box
            )
        else:
            locs = gausslq.locs_from_fits(
                identifications, theta, box, em
            )
        if callable(fit_progress_callback):
            fit_progress_callback(len(identifications))
        identify_info = {
            "Generated by": f"Picasso: v{__version__} Identify",
            "Min. Net Gradient": parameters["Min. Net Gradient"],
            "Box Size": box,
            "ROI": roi,
            "Frame Bounds": frame_bounds,
        }
        fit_info = {
            "Generated by": f"Picasso: v{__version__} Fit 2D",
            "Fit method": fitting_method,
        }
        if fitting_method == "gaussmle":
            fit_info["Convergence criterion"] = eps
            fit_info["Max iterations"] = max_it
        fit_info = fit_info | camera_info
        info = movie_info + [identify_info] + [fit_info]
        if return_info:
            return locs, info
        return locs
    lazy = not (
        isinstance(movie, (np.ndarray, np.memmap))
        or hasattr(movie, "__array__")
    )
    if lazy:
        from picasso_tpu import stream

        identifications, spots = stream.identify_and_cut(
            movie,
            parameters["Min. Net Gradient"],
            parameters["Box Size"],
            roi=roi,
            frame_bounds=frame_bounds,
            progress_callback=identification_progress_callback,
        )
        identify_info = {
            "Generated by": f"Picasso: v{__version__} Identify",
            "Min. Net Gradient": parameters["Min. Net Gradient"],
            "Box Size": parameters["Box Size"],
            "ROI": roi,
            "Frame Bounds": frame_bounds,
        }
    else:
        identifications, identify_info = identify(
            movie,
            parameters["Min. Net Gradient"],
            parameters["Box Size"],
            roi=roi,
            frame_bounds=frame_bounds,
            threaded=threaded,
            progress_callback=identification_progress_callback,
            return_info=True,
        )
    locs, fit_info = fit2D(
        movie=movie,
        movie_info=movie_info,
        camera_info=camera_info,
        identifications=identifications,
        box=parameters["Box Size"],
        fitting_method=fitting_method,
        eps=eps,
        max_it=max_it,
        mle_method=mle_method,
        multiprocess=threaded,
        progress_callback=fit_progress_callback,
        spots=spots,
    )
    info = movie_info + [identify_info] + [fit_info]
    if return_info:
        return locs, info
    return locs


def localize_3D(
    movie,
    *,
    movie_info: list[dict],
    camera_info: dict,
    box: int,
    minimum_ng: float,
    calibration_3d,
    roi=None,
    frame_bounds=None,
    fitting_method: Literal[
        "gausslq", "gausslq-gpu", "gaussmle"
    ] = "gausslq",
    eps: float = 0.001,
    max_it: int = 100,
    mle_method: Literal["sigma", "sigmaxy"] = "sigmaxy",
    multiprocess: bool = True,
    identification_progress_callback=None,
    fit_progress_callback=None,
    fit_z_progress_callback=None,
) -> tuple[pd.DataFrame, list[dict]]:
    """2D localization followed by astigmatism z fitting (Huang et al.,
    Science 2008; picasso/localize.py:1818)."""
    from picasso_tpu import zfit

    locs, info = localize(
        movie,
        camera_info,
        {"Min. Net Gradient": minimum_ng, "Box Size": box},
        roi=roi,
        frame_bounds=frame_bounds,
        movie_info=movie_info,
        fitting_method=fitting_method,
        eps=eps,
        max_it=max_it,
        mle_method=mle_method,
        threaded=multiprocess,
        identification_progress_callback=identification_progress_callback,
        fit_progress_callback=fit_progress_callback,
        return_info=True,
    )
    if isinstance(calibration_3d, str):
        import yaml

        with open(calibration_3d) as f:
            calibration_3d = yaml.full_load(f)
    pixelsize = camera_info.get("Pixelsize", 130)
    zfit_method = (
        "gaussmle" if fitting_method == "gaussmle" else "gausslq"
    )
    locs, info = zfit.zfit(
        locs,
        info,
        calibration=calibration_3d,
        pixelsize=pixelsize,
        fitting_method=zfit_method,
        progress_callback=fit_z_progress_callback,
    )
    return locs, info


# ---------------------------------------------------------------------------
# QC metrics (per-file summary; picasso/localize.py:2037-2141)
# ---------------------------------------------------------------------------

MAX_LOCS = int(1e6)


def check_nena(locs, info, callback=None):
    """NeNA localization precision in px on (subsampled) locs; NaN if
    the fit fails (picasso/localize.py:2037)."""
    from picasso_tpu import postprocess

    locs = locs[:MAX_LOCS]
    try:
        _, nena_px = postprocess.nena(locs, info, callback=callback)
    except Exception:
        nena_px = float("nan")
    return float(nena_px)


def check_kinetics(locs, info):
    """Mean binding-event length in frames (picasso/localize.py:2073)."""
    from picasso_tpu import postprocess

    locs = locs[:MAX_LOCS]
    linked = postprocess.link(locs, info)
    return float(np.mean(linked["len"]))


def check_drift(locs, info, callback=None):
    """Mean RCC drift (x, y) on locs subsampled to MAX_LOCS — the
    same metric the reference stores in the summary DB
    (picasso/localize.py:2096/2135-2137)."""
    from picasso_tpu import postprocess

    steps = max(1, len(locs) // MAX_LOCS)
    locs = locs[::steps]
    n_frames = lib.get_from_metadata(info, "Frames")
    segmentation = max(1, n_frames // 10)
    drift, _ = postprocess.undrift(
        locs, info, segmentation, display=False
    )
    return float(drift["x"].mean()), float(drift["y"].mean())


# ---------------------------------------------------------------------------
# Per-file summary DB (picasso/localize.py:2144-2258)
# ---------------------------------------------------------------------------


def get_file_summary(
    file: str,
    file_hdf: str | None,
    drift=None,
    len_mean=None,
    nena=None,
) -> dict:
    """Summarize one localization file: per-column means/stds, settings
    and QC metrics (NeNA, kinetics, drift)
    (picasso/localize.py:2144)."""
    import os
    from datetime import datetime

    from picasso_tpu import io

    if file_hdf is None:
        base, _ = os.path.splitext(file)
        file_hdf = base + "_locs.hdf5"
    locs, info = io.load_locs(file_hdf)
    summary = {}
    for col in MEAN_COLS:
        if col in locs.columns:
            summary[col + "_mean"] = float(locs[col].mean())
            summary[col + "_std"] = float(locs[col].std())
        else:
            summary[col + "_mean"] = float("nan")
            summary[col + "_std"] = float("nan")
    for col in SET_COLS:
        col_ = col.lower()
        for inf in info:
            if col in inf:
                summary[col_] = inf[col]
    for col in SET_COLS:
        col_ = col.lower()
        if col_ not in summary:
            summary[col_] = float("nan")
    nena_px = check_nena(locs, info) if nena is None else nena
    len_mean = (
        check_kinetics(locs, info) if len_mean is None else len_mean
    )
    drift_x, drift_y = (
        check_drift(locs, info) if drift is None else drift
    )
    summary["len_mean"] = len_mean
    summary["n_locs"] = len(locs)
    summary["locs_frame"] = len(locs) / summary["frames"]
    summary["drift_x"] = drift_x
    summary["drift_y"] = drift_y
    summary["nena_px"] = nena_px
    summary["nena_nm"] = nena_px * summary["pixelsize"]
    summary["filename"] = os.path.normpath(file)
    summary["filename_hdf"] = file_hdf
    summary["file_created"] = datetime.fromtimestamp(
        os.path.getmtime(file)
    )
    summary["entry_created"] = datetime.now()
    return summary


def _db_filename() -> str:
    """SQLite DB path under ~/.picasso (picasso/localize.py:2221)."""
    import os

    picasso_dir = os.path.join(os.path.expanduser("~"), ".picasso")
    os.makedirs(picasso_dir, exist_ok=True)
    return os.path.abspath(
        os.path.join(picasso_dir, "app_0410.db")
    )


def _save_file_summary(summary: dict) -> None:
    """Append the summary to the 'files' table
    (picasso/localize.py:2242)."""
    import sqlite3

    s = pd.Series(summary, index=summary.keys()).to_frame().T
    with sqlite3.connect(_db_filename()) as con:
        s.to_sql("files", con=con, if_exists="append", index=False)


def add_file_to_db(
    file: str, file_hdf: str | None, drift=None, len_mean=None,
    nena=None,
) -> None:
    """Summarize a file and store it in the monitoring DB
    (picasso/localize.py:2250)."""
    _save_file_summary(
        get_file_summary(file, file_hdf, drift, len_mean, nena)
    )


# ---------------------------------------------------------------------------
# API-compatibility aliases (deprecated names in the reference)
# ---------------------------------------------------------------------------


def local_maxima(frame, box):
    """Alias for the single-image identification primitives
    (picasso/localize.py:84)."""
    import jax.numpy as jnp

    from picasso_tpu.ops.identify import identify_maps

    maxima, _ = identify_maps(
        jnp.asarray(np.asarray(frame, np.float32))[None], box
    )
    y, x = np.nonzero(np.asarray(maxima)[0])
    return y, x


def gradient_at(frame, y, x, i):
    """Central-difference gradient at one pixel
    (picasso/localize.py:137)."""
    frame = np.asarray(frame)
    gy = float(frame[y + 1, x]) - float(frame[y - 1, x])
    gx = float(frame[y, x + 1]) - float(frame[y, x - 1])
    return gy, gx


def net_gradient(frame, y, x, box, uy, ux):
    """Net gradient at given maxima (picasso/localize.py:184)."""
    frame = np.asarray(frame, np.float64)
    half = box // 2
    ng = np.zeros(len(x), np.float32)
    for i, (yi, xi) in enumerate(zip(y, x)):
        for ki, k in enumerate(range(yi - half, yi + half + 1)):
            for li, m in enumerate(range(xi - half, xi + half + 1)):
                if k == yi and m == xi:
                    continue
                gy, gx = gradient_at(frame, k, m, i)
                ng[i] += gy * uy[ki, li] + gx * ux[ki, li]
    return ng


def identify_async(
    movie, minimum_ng, box, *, roi=None, frame_bounds=None
):
    """API-compatible shim for the reference's threaded launcher
    (picasso/localize.py:482): the batched identification completes
    eagerly; ``current`` is already at n_frames."""
    ids = identify(
        movie, minimum_ng, box, roi=roi, frame_bounds=frame_bounds,
        return_info=False,
    )

    class _Done:
        def __init__(self, result):
            self._r = result

        def result(self):
            return self._r

        def done(self):
            return True

        def cancel(self):
            return False

    return [len(movie)], [_Done(ids)]


def identifications_from_futures(futures) -> pd.DataFrame:
    """Collect identification futures (picasso/localize.py:457)."""
    ids = pd.concat(
        [f.result() for f in futures], ignore_index=True
    )
    ids.sort_values(by="frame", kind="stable", inplace=True)
    return ids.reset_index(drop=True)


def locs_to_identifications(
    locs: pd.DataFrame, movie_info: list[dict], n_frames: int
) -> pd.DataFrame:
    """Expand each localization into identifications over the
    surrounding +-n_frames window for refitting
    (picasso/localize.py:857)."""
    assert isinstance(locs, pd.DataFrame)
    assert isinstance(n_frames, int) and n_frames >= 0
    max_frames = lib.get_from_metadata(
        movie_info, "Frames", raise_error=True
    )
    rows = {"frame": [], "x": [], "y": [], "net_gradient": [],
            "n_id": []}
    n_id = 0
    for _, loc in locs.iterrows():
        f = int(loc["frame"])
        if f > n_frames and f < (max_frames - n_frames):
            span = np.arange(f - n_frames, f + n_frames + 1)
            rows["frame"].extend(span.tolist())
            rows["x"].extend([int(round(loc["x"]))] * len(span))
            rows["y"].extend([int(round(loc["y"]))] * len(span))
            rows["net_gradient"].extend([101.0] * len(span))
            rows["n_id"].extend([n_id + 1] * len(span))
        n_id += 1
    return pd.DataFrame(rows)


def save_file_summary(summary: dict) -> None:
    """Alias of _save_file_summary (picasso/localize.py:2233)."""
    _save_file_summary(summary)
