"""picasso_tpu command-line interface.

Headless batch drivers mirroring the reference CLI command set
(picasso/__main__.py:2390-3360): localize, render, drift correction
(RCC/AIM/fiducials), linking, clustering (DBSCAN/HDBSCAN/SMLM), G5M,
SPINNA, nearest neighbors, group statistics, pair correlation, format
conversions and the monitoring server. Each stage reads/writes the
HDF5 + YAML contract, so pipelines resume from any intermediate file.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def _iter_files(pattern: str) -> list[str]:
    paths = sorted(glob.glob(pattern))
    if not paths:
        print(f"No files matching {pattern}")
    return paths


def _out_path(path: str, suffix: str) -> str:
    base, _ = os.path.splitext(path)
    return base + suffix + ".hdf5"


# ---------------------------------------------------------------------------
# Command implementations
# ---------------------------------------------------------------------------


def _toraw(args):
    from picasso_tpu import io

    io.to_raw(args.files)


def _toims(args):
    """Convert a movie to Bitplane Imaris .ims (portable writer)."""
    import glob as _glob

    from picasso_tpu import io

    for path in sorted(_glob.glob(args.files)):
        movie, info = io.load_movie(path)
        out = os.path.splitext(path)[0] + ".ims"
        io.write_ims(
            out, movie[:], info, stacked=args.stacked
        )
        print(f"Wrote {out}")


def _localize(args):
    from picasso_tpu import io, lib, localize

    camera_info = {
        "Baseline": args.baseline,
        "Sensitivity": args.sensitivity,
        "Gain": args.gain,
        "Qe": args.qe,
        "Pixelsize": args.pixelsize,
    }
    method_map = {
        "mle": "gaussmle",
        "lq": "gausslq",
        "lq-gpu": "gausslq-gpu",
        "avg": "avg",
        "lq-3d": "gausslq",
        "lq-gpu-3d": "gausslq-gpu",
        "mle-3d": "gaussmle",
    }
    fitting_method = method_map[args.fit_method]
    is_3d = args.fit_method.endswith("-3d")
    roi = None
    if args.roi is not None:
        y0, x0, y1, x1 = args.roi
        roi = ((y0, x0), (y1, x1))
    frame_bounds = tuple(args.frame_bounds) if args.frame_bounds else None

    for path in _iter_files(args.files):
        print(f"Localizing {path}")
        movie, info = io.load_movie(path)
        if is_3d:
            import yaml

            with open(args.zc) as f:
                calibration = yaml.full_load(f)
            locs, new_info = localize.localize_3D(
                movie,
                movie_info=info,
                camera_info=camera_info,
                box=args.box_side_length,
                minimum_ng=args.gradient,
                calibration_3d=calibration,
                roi=roi,
                frame_bounds=frame_bounds,
                fitting_method=fitting_method,
                identification_progress_callback="console",
                fit_progress_callback="console",
            )
        else:
            locs, new_info = localize.localize(
                movie,
                camera_info,
                {
                    "Min. Net Gradient": args.gradient,
                    "Box Size": args.box_side_length,
                },
                roi=roi,
                frame_bounds=frame_bounds,
                movie_info=info,
                fitting_method=fitting_method,
                identification_progress_callback="console",
                fit_progress_callback="console",
                return_info=True,
            )
        out = _out_path(path, "_locs" + args.suffix)
        io.save_locs(out, locs, new_info)
        print(f"Saved {len(locs)} locs to {out}")
        if args.drift > 0:
            try:
                _undrift_rcc_single(out, args.drift, False)
            except Exception as e:
                print(f"RCC undrift failed: {e}")
        if args.database:
            localize.add_file_to_db(path, out)


def _render(args):
    from picasso_tpu import io, render

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        _, image = render.render(
            locs,
            info,
            oversampling=args.oversampling,
            blur_method=(
                None
                if args.blur_method == "none"
                else args.blur_method
            ),
        )
        out = os.path.splitext(path)[0] + ".png"
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(
            out,
            render.scale_contrast(image, autoscale=True),
            cmap=args.cmap,
            vmin=0,
            vmax=1,
        )
        print(f"Rendered {path} -> {out}")


def _undrift_rcc_single(path, segmentation, display, fromfile=None):
    from picasso_tpu import io, postprocess

    locs, info = io.load_locs(path)
    if fromfile:
        drift = io.load_drift(fromfile)
        locs = postprocess.apply_drift(locs, info, drift=drift)
        new_info = info + [
            {"Generated by": "Picasso Undrift (from file)"}
        ]
    else:
        drift, locs = postprocess.undrift(
            locs, info, int(segmentation), display=False
        )
        base = os.path.splitext(path)[0]
        io.save_drift(base + "_drift.txt", drift)
        new_info = info + [
            {
                "Generated by": "Picasso Undrift RCC",
                "Segmentation": segmentation,
            }
        ]
    out = _out_path(path, "_undrift")
    io.save_locs(out, locs, new_info)
    print(f"Undrifted -> {out}")


def _undrift(args):
    for path in _iter_files(args.files):
        _undrift_rcc_single(
            path, args.segmentation, args.display, args.fromfile
        )


def _aim(args):
    from picasso_tpu import aim, io

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        locs, new_info, drift = aim.aim(
            locs,
            info,
            segmentation=int(args.segmentation),
            intersect_d=args.intersectdist,
            roi_r=args.roiradius,
        )
        base = os.path.splitext(path)[0]
        io.save_drift(base + "_aimdrift.txt", drift)
        out = _out_path(path, "_aim")
        io.save_locs(out, locs, new_info)
        print(f"AIM undrifted -> {out}")


def _undrift_fiducials(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        locs, new_info, drift = postprocess.undrift_from_fiducials(
            locs, info
        )
        base = os.path.splitext(path)[0]
        io.save_drift(base + "_fiducialdrift.txt", drift)
        out = _out_path(path, "_undrift")
        io.save_locs(out, locs, new_info)
        print(f"Fiducial undrifted -> {out}")


def _link(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        linked = postprocess.link(
            locs,
            info,
            r_max=args.distance,
            max_dark_time=args.tolerance,
        )
        new_info = info + [
            {
                "Generated by": "Picasso Link",
                "Maximum distance": args.distance,
                "Maximum transient dark time": args.tolerance,
            }
        ]
        out = _out_path(path, "_link")
        io.save_locs(out, linked, new_info)
        print(f"Linked {len(locs)} -> {len(linked)} events: {out}")


def _dark(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        out_locs = postprocess.compute_dark_times(locs)
        out = _out_path(path, "_dark")
        io.save_locs(
            out, out_locs,
            info + [{"Generated by": "Picasso Dark"}],
        )
        print(f"Dark times -> {out}")


def _dbscan(args):
    from picasso_tpu import clusterer, io, lib

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        pixelsize = lib.get_from_metadata(info, "Pixelsize", 130)
        clustered, cinfo = clusterer.dbscan(
            locs, args.radius, args.density, pixelsize=pixelsize,
            return_info=True,
        )
        out = _out_path(path, "_dbscan")
        io.save_locs(out, clustered, info + [cinfo])
        centers = clusterer.find_cluster_centers(clustered, pixelsize)
        io.save_locs(
            _out_path(path, "_dbscan_centers"), centers,
            info + [cinfo],
        )
        print(f"DBSCAN -> {out}")


def _hdbscan(args):
    from picasso_tpu import clusterer, io, lib

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        pixelsize = lib.get_from_metadata(info, "Pixelsize", 130)
        clustered, cinfo = clusterer.hdbscan(
            locs, args.min_cluster, args.min_samples,
            pixelsize=pixelsize, return_info=True,
        )
        out = _out_path(path, "_hdbscan")
        io.save_locs(out, clustered, info + [cinfo])
        centers = clusterer.find_cluster_centers(clustered, pixelsize)
        io.save_locs(
            _out_path(path, "_hdbscan_centers"), centers,
            info + [cinfo],
        )
        print(f"HDBSCAN -> {out}")


def _smlm_cluster(args):
    from picasso_tpu import clusterer, io, lib

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        pixelsize = lib.get_from_metadata(info, "Pixelsize", 130)
        clustered, cinfo = clusterer.cluster(
            locs,
            radius_xy=args.radius,
            min_locs=args.min_locs,
            frame_analysis=bool(args.basic_fa),
            radius_z=args.radius_z,
            pixelsize=pixelsize,
            return_info=True,
        )
        out = _out_path(path, "_clustered")
        io.save_locs(out, clustered, info + [cinfo])
        centers = clusterer.find_cluster_centers(clustered, pixelsize)
        io.save_locs(
            _out_path(path, "_cluster_centers"), centers,
            info + [cinfo],
        )
        print(f"SMLM cluster -> {out}")


def _g5m_cmd(args):
    from picasso_tpu import g5m, io

    calibration = None
    if args.zc:
        import yaml

        with open(args.zc) as f:
            calibration = yaml.full_load(f)
    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        centers, clustered, new_info = g5m.g5m(
            locs,
            info,
            min_locs=args.min_locs,
            calibration=calibration,
            callback_parent="console",
        )
        io.save_locs(_out_path(path, "_g5m"), centers, new_info)
        io.save_locs(
            _out_path(path, "_g5m_locs"), clustered, new_info
        )
        print(f"G5M -> {_out_path(path, '_g5m')}")


def _nneighbor(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        clusters = io.load_clusters(path)
        cols = ["x", "y"] + (
            ["z"] if "z" in clusters.columns else []
        )
        X = clusters[cols].to_numpy()
        nn = postprocess.nn_analysis(X, X, 1)
        out = os.path.splitext(path)[0] + "_nn.csv"
        np.savetxt(out, nn, delimiter=",")
        print(f"Nearest neighbors -> {out}")


def _density(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        locs = postprocess.compute_local_density(
            locs, info, args.radius
        )
        out = _out_path(path, "_density")
        io.save_locs(
            out, locs, info + [{"Generated by": "Picasso Density"}]
        )
        print(f"Density -> {out}")


def _clusterfilter(args):
    from picasso_tpu import io

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        vals = locs[args.parameter]
        kept = locs[
            (vals >= args.minval) & (vals <= args.maxval)
        ]
        out = _out_path(path, "_filter")
        io.save_locs(
            out, kept,
            info + [
                {
                    "Generated by": "Picasso Filter",
                    "Parameter": args.parameter,
                    "Min": args.minval,
                    "Max": args.maxval,
                }
            ],
        )
        print(f"Filter {len(locs)} -> {len(kept)}: {out}")


def _align(args):
    from picasso_tpu import io, postprocess

    paths = []
    for pattern in args.files:
        paths.extend(sorted(glob.glob(pattern)))
    if len(paths) < 2:
        print("align requires at least two files")
        return
    locs_list, infos = [], []
    for p in paths:
        locs, info = io.load_locs(p)
        locs_list.append(locs)
        infos.append(info)
    aligned = postprocess.align_rcc(locs_list, infos)
    for p, locs, info in zip(paths, aligned, infos):
        out = _out_path(p, "_align")
        io.save_locs(
            out, locs, info + [{"Generated by": "Picasso Align"}]
        )
        print(f"Aligned -> {out}")


def _join(args):
    from picasso_tpu import io, lib

    paths = []
    for pattern in args.files:
        paths.extend(sorted(glob.glob(pattern)))
    locs_list, infos = [], []
    for p in paths:
        locs, info = io.load_locs(p)
        locs_list.append(locs)
        infos.append(info)
    joined = lib.merge_locs(locs_list, increment_frames=args.keep_frames is False)
    out = _out_path(paths[0], "_join")
    io.save_locs(
        out, joined, infos[0] + [{"Generated by": "Picasso Join"}]
    )
    print(f"Joined {len(paths)} files -> {out}")


def _groupprops(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        groups = postprocess.groupprops(locs)
        out = _out_path(path, "_groupprops")
        io.save_datasets(out, info, groups=groups)
        print(f"Group properties -> {out}")


def _pc(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        bins, pc = postprocess.pair_correlation(
            locs, info, args.binsize, args.rmax
        )
        out = os.path.splitext(path)[0] + "_pc.csv"
        np.savetxt(
            out, np.column_stack([bins, pc]), delimiter=","
        )
        print(f"Pair correlation -> {out}")


def _cluster_combine(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        combined = postprocess.cluster_combine(locs)
        out = _out_path(path, "_comb")
        io.save_locs(
            out, combined,
            info + [{"Generated by": "Picasso Combine"}],
        )
        print(f"Cluster combine -> {out}")


def _cluster_combine_dist(args):
    from picasso_tpu import io, postprocess

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        px = None
        for block in info:
            if isinstance(block, dict) and "Pixelsize" in block:
                px = block["Pixelsize"]
        combined = postprocess.cluster_combine_dist(locs, px)
        out = _out_path(path, "_cdist")
        io.save_locs(
            out, combined,
            info + [{"Generated by": "Picasso CombineDist"}],
        )
        print(f"Cluster combine dist -> {out}")


def _csv2hdf(args):
    from picasso_tpu import io

    for path in _iter_files(args.files):
        locs, info = io.import_ts(path, pixelsize=args.pixelsize)
        out = os.path.splitext(path)[0] + ".hdf5"
        io.save_locs(out, locs, info)
        print(f"Imported -> {out}")


def _hdf2csv(args):
    from picasso_tpu import io

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        out = os.path.splitext(path)[0] + ".csv"
        locs.to_csv(out, index=False)
        print(f"Exported -> {out}")


def _hdf2ts(args):
    from picasso_tpu import io

    for path in _iter_files(args.files):
        locs, info = io.load_locs(path)
        out = os.path.splitext(path)[0] + "_ts.csv"
        io.export_ts(out, locs, info)
        print(f"Exported (ThunderSTORM) -> {out}")


def _make_exporter(fn_name, ext, label):
    def handler(args):
        from picasso_tpu import io

        fn = getattr(io, fn_name)
        for path in _iter_files(args.files):
            locs, info = io.load_locs(path)
            out = os.path.splitext(path)[0] + ext
            fn(out, locs, info)
            print(f"Exported ({label}) -> {out}")

    return handler


_hdf2imagej = _make_exporter("export_txt_imagej", "_ij.txt", "ImageJ")
_hdf2nis = _make_exporter("export_txt_nis", "_nis.txt", "NIS")
_hdf2chimera = _make_exporter(
    "export_xyz_chimera", ".xyz", "Chimera"
)
_hdf2visp = _make_exporter("export_3d_visp", ".3d", "ViSP")


def _spinna_cmd(args):
    from picasso_tpu import io, spinna

    structures, targets = spinna.load_structures(args.structures)
    exp_data = {}
    for t, p in zip(targets, args.files):
        locs, info = io.load_locs(p)
        px = 130
        coords = np.column_stack(
            [locs["x"].to_numpy() * px, locs["y"].to_numpy() * px]
        )
        exp_data[t] = coords
    mixer = spinna.StructureMixer(
        structures,
        label_unc={"ALL": args.label_unc},
        le={"ALL": args.le},
        width=args.width,
        height=args.height,
    )
    N_total = {
        t: int(len(exp_data[t]) / args.le) for t in targets
    }
    space = spinna.generate_N_structures(
        structures, N_total, args.granularity
    )
    spin = spinna.SPINNA(mixer, exp_data, N_sim=args.nsim)
    props, score = spin.fit(
        space, fitting_mode=args.mode, callback="console"
    )[:2]
    names = mixer.get_structure_names()
    print("SPINNA best fit:")
    for n, p in zip(names, np.atleast_1d(props)):
        print(f"  {n}: {p:.1f} %")
    print(f"KS score: {score:.4f}")


def _spinna_batch_cmd(args):
    from picasso_tpu import spinna

    summary = spinna.batch_analysis(
        args.parameters,
        bootstrap=args.bootstrap,
        verbose=args.verbose,
        fitting_mode=args.mode,
    )
    print(summary.to_string(index=False))


def _server(args):
    import subprocess

    app = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "server", "app.py"
    )
    subprocess.run(
        [sys.executable, "-m", "streamlit", "run", app]
    )


def _gui_stub(args):
    """Launch the matplotlib-based app for a GUI subcommand when a
    display backend exists; otherwise explain the headless options."""
    launchers = {
        "design": lambda gui, plt: gui.DesignApp(),
        "simulate": lambda gui, plt: gui.SimulateApp(),
        "filter": None,  # needs a locs file; see message below
    }
    import os as _os
    import sys as _sys

    has_display = (
        _sys.platform in ("darwin", "win32")
        or bool(_os.environ.get("DISPLAY"))
        or bool(_os.environ.get("WAYLAND_DISPLAY"))
    )
    interactive = False
    if has_display:
        try:
            import matplotlib
            import matplotlib.pyplot as plt

            interactive = matplotlib.get_backend().lower() != "agg"
        except Exception:
            interactive = False
    launcher = launchers.get(args.command)
    if interactive and launcher is not None:
        from picasso_tpu import gui

        launcher(gui, plt)
        plt.show()
        return
    print(
        f"'{args.command}' runs from python: picasso_tpu.gui provides "
        "RenderApp / LocalizeApp / FilterApp / RotationApp / "
        "AverageApp / SimulateApp / DesignApp / SpinnaApp / "
        "NanotronApp / ToRawApp (matplotlib, any backend). All "
        "processing is also available headlessly through this CLI, "
        "and outputs are file-compatible with the reference Picasso "
        "GUI."
    )


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def main(argv=None):
    """CLI entry point. ``argv`` defaults to ``sys.argv[1:]``; tests
    call ``main([...])`` in-process to avoid a fresh interpreter (and
    JAX import) per subcommand."""
    parser = argparse.ArgumentParser(
        "picasso-tpu",
        description=(
            "TPU-native single-molecule localization microscopy suite"
        ),
    )
    subparsers = parser.add_subparsers(dest="command")

    p = subparsers.add_parser(
        "toraw", help="convert TIFF movies into raw format"
    )
    p.add_argument("files", help="path pattern of movie files")

    p = subparsers.add_parser(
        "toims", help="convert movies into Bitplane Imaris .ims"
    )
    p.add_argument("files", help="path pattern of movie files")
    p.add_argument(
        "--stacked", action="store_true",
        help="write all frames as one z-stack TimePoint",
    )

    p = subparsers.add_parser(
        "localize", help="identify and fit single molecule spots"
    )
    p.add_argument("files", nargs="?", help="movie file or pattern")
    p.add_argument("-b", "--box-side-length", type=int, default=7)
    p.add_argument(
        "-a",
        "--fit-method",
        choices=[
            "mle", "lq", "lq-gpu", "lq-3d", "lq-gpu-3d", "mle-3d",
            "avg",
        ],
        default="mle",
    )
    p.add_argument("-g", "--gradient", type=int, default=5000)
    p.add_argument(
        "--profile",
        metavar="DIR",
        help="capture a jax.profiler device trace into DIR",
    )
    p.add_argument(
        "-d", "--drift", type=int, default=1000,
        help="RCC segmentation, 0 to deactivate",
    )
    p.add_argument("-r", "--roi", type=int, nargs=4, default=None)
    p.add_argument(
        "-fb", "--frame-bounds", type=int, nargs=2, default=None
    )
    p.add_argument("-bl", "--baseline", type=int, default=0)
    p.add_argument("-s", "--sensitivity", type=float, default=1)
    p.add_argument("-ga", "--gain", type=int, default=1)
    p.add_argument("-qe", "--qe", type=float, default=1)
    p.add_argument("-mf", "--mf", type=float, default=0)
    p.add_argument("-px", "--pixelsize", type=int, default=130)
    p.add_argument("-zc", "--zc", type=str, default="")
    p.add_argument("-sf", "--suffix", type=str, default="")
    p.add_argument("-db", "--database", action="store_true")

    p = subparsers.add_parser(
        "render", help="render localization based images"
    )
    p.add_argument("files", nargs="?")
    p.add_argument("-o", "--oversampling", type=float, default=1.0)
    p.add_argument(
        "-b", "--blur-method",
        choices=["none", "convolve", "gaussian", "gaussian_iso",
                 "smooth"],
        default="convolve",
    )
    p.add_argument("-c", "--cmap", default="hot")

    p = subparsers.add_parser(
        "undrift", help="drift correction by RCC"
    )
    p.add_argument("files")
    p.add_argument("-s", "--segmentation", type=float, default=1000)
    p.add_argument("-f", "--fromfile", type=str)
    p.add_argument("-d", "--display", action="store_true")

    p = subparsers.add_parser("aim", help="drift correction by AIM")
    p.add_argument("files")
    p.add_argument("-s", "--segmentation", type=float, default=100)
    p.add_argument(
        "-i", "--intersectdist", type=float, default=20 / 130
    )
    p.add_argument("-r", "--roiradius", type=float, default=60 / 130)

    p = subparsers.add_parser(
        "undrift_fiducials", help="drift correction from fiducials"
    )
    p.add_argument("files")

    p = subparsers.add_parser(
        "link", help="link localizations in consecutive frames"
    )
    p.add_argument("files")
    p.add_argument("-d", "--distance", type=float, default=1.0)
    p.add_argument("-t", "--tolerance", type=int, default=1)

    p = subparsers.add_parser(
        "dark", help="compute dark times for linked localizations"
    )
    p.add_argument("files")

    p = subparsers.add_parser("dbscan", help="DBSCAN clustering")
    p.add_argument("files")
    p.add_argument("radius", type=float)
    p.add_argument("density", type=int)

    p = subparsers.add_parser("hdbscan", help="HDBSCAN clustering")
    p.add_argument("files")
    p.add_argument("min_cluster", type=int)
    p.add_argument("min_samples", type=int)

    p = subparsers.add_parser(
        "smlm_cluster", help="SMLM clustering"
    )
    p.add_argument("files")
    p.add_argument("radius", type=float)
    p.add_argument("min_locs", type=int)
    p.add_argument("-z", "--radius-z", type=float, default=None)
    p.add_argument("-f", "--basic-fa", type=int, default=0)

    p = subparsers.add_parser(
        "g5m", help="G5M molecular mapping (constrained GMM)"
    )
    p.add_argument("files")
    p.add_argument("-m", "--min-locs", type=int, default=10)
    p.add_argument("-zc", "--zc", type=str, default="")

    p = subparsers.add_parser(
        "nneighbor", help="nearest neighbors of clustered data"
    )
    p.add_argument("files", nargs="?")

    p = subparsers.add_parser(
        "density", help="local density computation"
    )
    p.add_argument("files")
    p.add_argument("radius", type=float)

    p = subparsers.add_parser(
        "clusterfilter", help="filter locs by a parameter range"
    )
    p.add_argument("files")
    p.add_argument("parameter")
    p.add_argument("minval", type=float)
    p.add_argument("maxval", type=float)

    p = subparsers.add_parser(
        "align", help="align channels by RCC"
    )
    p.add_argument("files", nargs="+")

    p = subparsers.add_parser("join", help="join hdf5 files")
    p.add_argument("files", nargs="+")
    p.add_argument("-k", "--keep-frames", action="store_true")

    p = subparsers.add_parser(
        "groupprops", help="per-group statistics"
    )
    p.add_argument("files")

    p = subparsers.add_parser("pc", help="pair correlation")
    p.add_argument("files")
    p.add_argument("-b", "--binsize", type=float, default=0.1)
    p.add_argument("-r", "--rmax", type=float, default=10.0)

    p = subparsers.add_parser(
        "cluster_combine", help="combine clustered localizations"
    )
    p.add_argument("files")

    p = subparsers.add_parser(
        "cluster_combine_dist",
        help="combine clusters + nearest cluster distances",
    )
    p.add_argument("files")

    p = subparsers.add_parser(
        "csv2hdf", help="import ThunderSTORM csv"
    )
    p.add_argument("files")
    p.add_argument(
        "-p", "--pixelsize", type=float, required=True,
        help="camera pixel size in nm",
    )

    p = subparsers.add_parser("hdf2csv", help="export to csv")
    p.add_argument("files")

    p = subparsers.add_parser(
        "hdf2ts", help="export to ThunderSTORM csv"
    )
    p.add_argument("files")

    for name, helptext in (
        ("hdf2imagej", "export to ImageJ txt"),
        ("hdf2nis", "export to NIS Elements txt"),
        ("hdf2chimera", "export to Chimera xyz"),
        ("hdf2visp", "export to ViSP 3d"),
    ):
        p = subparsers.add_parser(name, help=helptext)
        p.add_argument("files")

    p = subparsers.add_parser(
        "spinna", help="SPINNA stoichiometry fitting"
    )
    p.add_argument("structures", help="structures .yaml file")
    p.add_argument("files", nargs="+", help="one locs file per target")
    p.add_argument("-g", "--granularity", type=int, default=11)
    p.add_argument("-u", "--label-unc", type=float, default=3.0)
    p.add_argument("-l", "--le", type=float, default=1.0)
    p.add_argument("-W", "--width", type=float, default=None)
    p.add_argument("-H", "--height", type=float, default=None)
    p.add_argument("-n", "--nsim", type=int, default=1)
    p.add_argument(
        "-m", "--mode",
        choices=["coarse-to-fine", "bayesian", "brute-force"],
        default="coarse-to-fine",
    )

    p = subparsers.add_parser(
        "spinna-batch",
        help="SPINNA batch analysis from a CSV parameters file"
        " (one fit per row; LE fitting rows supported)",
    )
    p.add_argument("parameters", help="parameters .csv file")
    p.add_argument(
        "-b", "--bootstrap", action="store_true",
        help="bootstrap SEMs",
    )
    p.add_argument(
        "-v", "--verbose", action="store_true",
        help="per-row console progress",
    )
    p.add_argument(
        "-m", "--mode",
        choices=["coarse-to-fine", "bayesian", "brute-force"],
        default="bayesian",
    )

    subparsers.add_parser(
        "server", help="monitoring server (streamlit)"
    )
    for gui in ("filter", "design", "simulate", "average",
                "average3", "nanotron", "rotation"):
        subparsers.add_parser(gui, help=f"{gui} (GUI app)")

    args = parser.parse_args(argv)
    handlers = {
        "toraw": _toraw,
        "toims": _toims,
        "localize": _localize,
        "render": _render,
        "undrift": _undrift,
        "aim": _aim,
        "undrift_fiducials": _undrift_fiducials,
        "link": _link,
        "dark": _dark,
        "dbscan": _dbscan,
        "hdbscan": _hdbscan,
        "smlm_cluster": _smlm_cluster,
        "g5m": _g5m_cmd,
        "nneighbor": _nneighbor,
        "density": _density,
        "clusterfilter": _clusterfilter,
        "align": _align,
        "join": _join,
        "groupprops": _groupprops,
        "pc": _pc,
        "cluster_combine": _cluster_combine,
        "cluster_combine_dist": _cluster_combine_dist,
        "csv2hdf": _csv2hdf,
        "hdf2csv": _hdf2csv,
        "hdf2ts": _hdf2ts,
        "hdf2imagej": _hdf2imagej,
        "hdf2nis": _hdf2nis,
        "hdf2chimera": _hdf2chimera,
        "hdf2visp": _hdf2visp,
        "spinna": _spinna_cmd,
        "spinna-batch": _spinna_batch_cmd,
        "server": _server,
    }
    if args.command is None:
        parser.print_help()
        return
    handler = handlers.get(args.command, _gui_stub)
    # device tracing around any command via --profile / env var
    # (SURVEY §5: profiling is a first-class addition over the
    # reference's progress-bars-only observability)
    from picasso_tpu import profiling

    with profiling.trace(getattr(args, "profile", None)):
        handler(args)


if __name__ == "__main__":
    main()
