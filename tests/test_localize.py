"""Identification + fit orchestration: parity against a straight
numpy oracle of the reference algorithm and against the bundled
reference outputs."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from picasso_tpu import localize
from tests.conftest import BOX, CAMERA_INFO, MIN_NG


def _oracle_local_maxima(frame: np.ndarray, box: int):
    """Slow numpy transliteration of the reference semantics
    (reference localize.py:98-134) used as ground truth."""
    Y, X = frame.shape
    half = box // 2
    ys, xs = [], []
    for i in range(half, Y - half - 1):
        for j in range(half, X - half - 1):
            window = frame[i - half:i + half + 1, j - half:j + half + 1]
            flat = int(np.argmax(window))
            if flat == half * box + half:
                ys.append(i)
                xs.append(j)
    return np.array(ys, int), np.array(xs, int)


def _oracle_net_gradient(frame, y, x, box):
    half = box // 2
    val = half - np.arange(box, dtype=np.float32)
    ux = np.tile(val, (box, 1))
    uy = ux.T.copy()
    norm = np.sqrt(ux**2 + uy**2)
    with np.errstate(invalid="ignore", divide="ignore"):
        ux, uy = ux / norm, uy / norm
    ng = np.zeros(len(y), np.float64)
    f = frame.astype(np.float64)
    for i, (yi, xi) in enumerate(zip(y, x)):
        for ki, k in enumerate(range(yi - half, yi + half + 1)):
            for li, m in enumerate(range(xi - half, xi + half + 1)):
                if k == yi and m == xi:
                    continue
                gy = f[k + 1, m] - f[k - 1, m]
                gx = f[k, m + 1] - f[k, m - 1]
                ng[i] += gy * uy[ki, li] + gx * ux[ki, li]
    return ng


class TestIdentify:
    def test_matches_oracle_on_real_frame(self, movie):
        frame = np.asarray(movie[0], np.float32)
        oy, ox = _oracle_local_maxima(frame, BOX)
        ong = _oracle_net_gradient(frame, oy, ox, BOX)
        keep = ong > MIN_NG
        oy, ox, ong = oy[keep], ox[keep], ong[keep]

        y, x, ng = localize.identify_in_image(frame, MIN_NG, BOX)
        order = np.lexsort((x, y))
        oorder = np.lexsort((ox, oy))
        np.testing.assert_array_equal(y[order], oy[oorder])
        np.testing.assert_array_equal(x[order], ox[oorder])
        np.testing.assert_allclose(
            ng[order], ong[oorder], rtol=1e-4
        )

    def test_matches_oracle_on_many_frames(self, movie):
        ids = localize.identify(movie, MIN_NG, BOX, return_info=False)
        total_oracle = 0
        for f in range(len(movie)):
            frame = np.asarray(movie[f], np.float32)
            oy, ox = _oracle_local_maxima(frame, BOX)
            ong = _oracle_net_gradient(frame, oy, ox, BOX)
            total_oracle += int(np.sum(ong > MIN_NG))
        assert len(ids) == total_oracle

    def test_within_bounds(self, movie, real_identifications):
        ids = real_identifications
        Y, X = movie.shape[1:]
        half = BOX // 2
        assert (ids["x"] >= half).all()
        assert (ids["x"] < X - half - 1).all()
        assert (ids["y"] >= half).all()
        assert (ids["y"] < Y - half - 1).all()
        assert (ids["net_gradient"] > MIN_NG).all()

    def test_roi_is_subset(self, movie):
        ids = localize.identify(movie, MIN_NG, BOX, return_info=False)
        roi = ((8, 8), (28, 28))
        ids_roi = localize.identify(
            movie, MIN_NG, BOX, roi=roi, return_info=False
        )
        full = set(zip(ids["frame"], ids["y"], ids["x"]))
        sub = set(zip(ids_roi["frame"], ids_roi["y"], ids_roi["x"]))
        # ROI identifications within the interior must be a subset
        assert sub.issubset(full) or len(sub - full) <= len(sub) // 10

    def test_frame_bounds(self, movie):
        ids = localize.identify(
            movie, MIN_NG, BOX, frame_bounds=(10, 20), return_info=False
        )
        assert ids["frame"].min() >= 10
        assert ids["frame"].max() <= 20

    def test_return_info(self, movie):
        ids, info = localize.identify(
            movie, MIN_NG, BOX, return_info=True
        )
        assert info["Box Size"] == BOX
        assert info["Min. Net Gradient"] == MIN_NG


class TestSpots:
    def test_get_spots_shapes_and_values(
        self, movie, real_identifications
    ):
        spots = localize.get_spots(
            movie, real_identifications, BOX, CAMERA_INFO
        )
        assert spots.shape == (len(real_identifications), BOX, BOX)
        # center pixel must equal the movie value (unit camera)
        i = 0
        row = real_identifications.iloc[i]
        frame = np.asarray(movie[int(row["frame"])])
        assert spots[i, BOX // 2, BOX // 2] == frame[
            int(row["y"]), int(row["x"])
        ]

    def test_to_photons(self):
        spots = np.full((1, 3, 3), 110.0, np.float32)
        out = localize.get_spots.__wrapped__ if False else None
        from picasso_tpu.ops.identify import to_photons

        converted = to_photons(
            spots, {"Baseline": 100, "Sensitivity": 2, "Gain": 4}
        )
        np.testing.assert_allclose(converted, (110 - 100) * 2 / 4)


class TestFit2D:
    @pytest.mark.parametrize(
        "method", ["gausslq", "gaussmle", "avg", "gausslq-gpu"]
    )
    def test_fit_methods_run(
        self, movie, movie_info, real_identifications, method
    ):
        locs, info = localize.fit2D(
            movie,
            movie_info,
            dict(CAMERA_INFO, Pixelsize=130),
            real_identifications,
            BOX,
            fitting_method=method,
        )
        assert len(locs) == len(real_identifications)
        for col in ("frame", "x", "y", "photons", "sx", "sy", "bg",
                    "lpx", "lpy", "ellipticity", "net_gradient"):
            assert col in locs.columns
        assert info["Fit method"] == method

    def test_localize_end_to_end_matches_reference(
        self, movie, movie_info, locs
    ):
        """Full pipeline on the bundled movie vs the reference's own
        output (testdata_locs.hdf5, MLE): sub-0.05 px agreement.

        The bundled locs file was produced from the 1000-frame parent
        simulation (its yaml says Frames: 1000); the bundled movie is
        its first 100 frames, so we compare against the frame<100
        subset (30 locs)."""
        ours = localize.localize(
            movie,
            dict(CAMERA_INFO, Pixelsize=130),
            {"Min. Net Gradient": MIN_NG, "Box Size": BOX},
            movie_info=movie_info,
            fitting_method="gaussmle",
            max_it=1000,
            return_info=False,
        )
        ref = locs[locs["frame"] < len(movie)]
        assert abs(len(ours) - len(ref)) <= 2
        # Match localizations by (frame, rounded position)
        ours_s = ours.sort_values(["frame", "x", "y"]).reset_index(
            drop=True
        )
        ref_s = ref.sort_values(["frame", "x", "y"]).reset_index(
            drop=True
        )
        n = min(len(ours_s), len(ref_s))
        dx = ours_s["x"][:n].to_numpy() - ref_s["x"][:n].to_numpy()
        dy = ours_s["y"][:n].to_numpy() - ref_s["y"][:n].to_numpy()
        rms = np.sqrt(np.mean(dx**2 + dy**2))
        assert rms < 0.05, f"x/y RMS vs reference = {rms:.4f} px"
        dph = (
            ours_s["photons"][:n].to_numpy()
            / np.maximum(ref_s["photons"][:n].to_numpy(), 1)
        )
        assert np.median(np.abs(dph - 1)) < 0.05
        dlpx = (
            ours_s["lpx"][:n].to_numpy()
            - ref_s["lpx"][:n].to_numpy()
        )
        assert np.sqrt(np.mean(dlpx**2)) < 0.01


class TestPicksToIdentifications:
    def test_basic(self):
        ids = localize.picks_to_identifications(
            [(10, 12), (20, 22)], n_frames=5
        )
        assert len(ids) == 10
        assert set(ids["n_id"]) == {0, 1}
        assert (ids[ids["n_id"] == 0]["x"] == 10).all()


class TestIdentifyPrimitives:
    def _frame_with_peak(self, size=32, cy=16, cx=16, sigma=1.0,
                         photons=5000, bg=10):
        yy, xx = np.mgrid[:size, :size].astype(np.float64)
        img = bg + photons * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)
        ) / (2 * np.pi * sigma**2)
        return img.astype(np.float32)

    def test_single_peak_detected(self):
        frame = self._frame_with_peak()
        y, x, ng = localize.identify_in_image(frame, 500, 7)
        assert len(x) == 1
        assert (x[0], y[0]) == (16, 16)

    def test_multiple_peaks_far_apart(self):
        frame = self._frame_with_peak()
        frame += self._frame_with_peak(cy=8, cx=24)
        y, x, ng = localize.identify_in_image(frame, 500, 7)
        assert len(x) == 2

    def test_border_peaks_excluded(self):
        frame = self._frame_with_peak(cy=1, cx=1)
        y, x, ng = localize.identify_in_image(frame, 500, 7)
        assert len(x) == 0

    def test_flat_frame_no_maxima(self):
        frame = np.full((32, 32), 7.0, np.float32)
        y, x, ng = localize.identify_in_image(frame, 0.001, 7)
        assert len(x) == 0

    def test_high_threshold_rejects_all(self):
        frame = self._frame_with_peak()
        y, x, ng = localize.identify_in_image(frame, 1e12, 7)
        assert len(x) == 0

    def test_inverted_peak_negative_gradient(self):
        frame = 1000.0 - self._frame_with_peak(bg=0)
        ng = localize.net_gradient(
            frame.astype(np.float32),
            np.array([16]),
            np.array([16]),
            7,
            *_uv(7),
        )
        assert ng[0] < 0

    def test_roi_offsets_back_to_global(self):
        frame = self._frame_with_peak(cy=20, cx=24)
        y, x, ng = localize.identify_in_frame(
            frame, 500, 7, roi=((10, 10), (32, 32))
        )
        assert len(x) == 1
        assert (x[0], y[0]) == (24, 20)

    def test_roi_excludes_outside(self):
        frame = self._frame_with_peak(cy=5, cx=5)
        y, x, ng = localize.identify_in_frame(
            frame, 500, 7, roi=((16, 16), (32, 32))
        )
        assert len(x) == 0


def _uv(box):
    from picasso_tpu.ops.identify import _unit_vector_masks

    return _unit_vector_masks(box)


class TestToPhotons:
    def test_identity_camera(self):
        spots = np.random.default_rng(0).integers(
            0, 100, (4, 7, 7)
        ).astype(np.uint16)
        out = localize.get_spots.__globals__[
            "_identify_ops"
        ].to_photons(
            spots,
            {"Baseline": 0, "Sensitivity": 1, "Gain": 1},
        )
        np.testing.assert_array_equal(out, spots)
        assert out.dtype == np.float32

    def test_combined_transform(self):
        from picasso_tpu.ops.identify import to_photons

        spots = np.full((1, 3, 3), 300.0, np.float32)
        out = to_photons(
            spots, {"Baseline": 100, "Sensitivity": 0.5, "Gain": 2}
        )
        np.testing.assert_allclose(out, (300 - 100) * 0.5 / 2)


class TestPicksToIdentifications:
    def test_each_pick_in_every_frame(self):
        picks = [(10.0, 12.0), (20.0, 8.0)]
        ids = localize.picks_to_identifications(
            picks, n_frames=5
        )
        assert len(ids) == 10
        assert set(ids["frame"]) == set(range(5))

    def test_drift_applied(self):
        picks = [(10.0, 10.0)]
        drift = pd.DataFrame(
            {"x": np.arange(3) * 1.0, "y": np.zeros(3)}
        )
        ids = localize.picks_to_identifications(
            picks, n_frames=3, drift=drift
        )
        xs = ids.sort_values("frame")["x"].to_numpy()
        assert xs[1] == xs[0] + 1


class TestNorthStarParityGate:
    """The driver's north-star accuracy gate at sample-dataset scale
    (BASELINE.json: <5 nm RMS on the 5000-frame sample movie; the
    sample blob is stripped from the snapshot, so an equivalent movie
    is simulated — 32x32 px, 5000 frames, 130 nm pixels — and the
    pipeline is gated against the simulation's ground truth)."""

    PIXELSIZE = 130.0

    def test_localize_5000_frames_sub_5nm_rms(self):
        from picasso_tpu import simulate

        movie, sites, sim_info = simulate.simulate_movie(
            n_sites=16, imagesize=32, frames=5000, taud=8000,
            taub=400, photonrate=60, photonratestd=10,
            background=1.0, seed=7,
        )
        camera_info = {
            "Baseline": 0, "Sensitivity": 1, "Gain": 1,
            "Pixelsize": self.PIXELSIZE,
        }
        movie_info = [
            {
                "Frames": movie.shape[0],
                "Height": movie.shape[1],
                "Width": movie.shape[2],
            }
        ]
        locs = localize.localize(
            movie,
            camera_info,
            {"Min. Net Gradient": MIN_NG, "Box Size": BOX},
            movie_info=movie_info,
            fitting_method="gaussmle",
            return_info=False,
        )
        assert len(locs) >= 2000, (
            f"workload too small: {len(locs)} locs"
        )
        # match each localization to its nearest true binding site
        from scipy.spatial import cKDTree

        xy = np.column_stack(
            [locs["x"].to_numpy(), locs["y"].to_numpy()]
        )
        d, idx = cKDTree(sites).query(xy)
        # discard the rare multi-emitter overlap frames (>1.5 px off)
        good = d < 1.5
        assert good.mean() > 0.97
        rms_px = float(np.sqrt(np.mean(d[good] ** 2)))
        rms_nm = rms_px * self.PIXELSIZE
        assert rms_nm < 5.0, f"RMS vs ground truth = {rms_nm:.2f} nm"
        # per-column sanity at reference tolerances
        # (reference tests/test_gaussmle.py:50-115)
        assert np.isfinite(locs["lpx"].to_numpy()).all()
        assert (locs["photons"].to_numpy() > 0).all()
        med_sx = float(np.median(locs["sx"]))
        assert 0.7 < med_sx < 1.1  # psf 0.82 px
        assert float(np.median(locs["lpx"])) * self.PIXELSIZE < 5.0


class TestIdentificationsIO:
    def test_roundtrip_with_yaml_sidecar(self, movie, movie_info,
                                         tmp_path):
        from picasso_tpu import io

        ids = localize.identify(
            movie, MIN_NG, BOX, return_info=False
        )
        path = str(tmp_path / "ids.hdf5")
        io.save_identifications(
            path, ids, list(movie_info) + [{"Box Size": BOX}]
        )
        assert (tmp_path / "ids.yaml").exists()
        back, info = io.load_identifications(path)
        pd.testing.assert_frame_equal(
            back.reset_index(drop=True), ids.reset_index(drop=True),
            check_dtype=False,
        )
        assert info[-1]["Box Size"] == BOX

    def test_missing_dataset_raises(self, tmp_path):
        import h5py

        from picasso_tpu import io

        path = str(tmp_path / "empty.hdf5")
        with h5py.File(path, "w") as f:
            f.create_dataset("other", data=np.zeros(3))
        with open(str(tmp_path / "empty.yaml"), "w") as f:
            f.write("Frames: 1\n")
        with pytest.raises(KeyError):
            io.load_identifications(path)


class TestAsyncShims:
    def test_identify_async_matches_serial(self, movie):
        serial = localize.identify(
            movie, MIN_NG, BOX, return_info=False
        )
        current, futures = localize.identify_async(
            movie, MIN_NG, BOX
        )
        assert int(np.asarray(current).reshape(-1)[0]) == len(movie)
        collected = localize.identifications_from_futures(futures)
        pd.testing.assert_frame_equal(
            collected.reset_index(drop=True),
            serial.reset_index(drop=True),
        )


class TestFit2DValidation:
    def test_invalid_method_raises(self, movie, movie_info,
                                   real_identifications):
        with pytest.raises(AssertionError):
            localize.fit2D(
                movie, movie_info, dict(CAMERA_INFO, Pixelsize=130),
                real_identifications, BOX,
                fitting_method="bogus",
            )

    def test_negative_eps_rejected(self, movie, movie_info,
                                   real_identifications):
        with pytest.raises(AssertionError):
            localize.fit2D(
                movie, movie_info, dict(CAMERA_INFO, Pixelsize=130),
                real_identifications, BOX, eps=-1.0,
            )

    def test_missing_pixelsize_warns(self, movie, movie_info,
                                     real_identifications):
        with pytest.warns(UserWarning, match="Pixelsize"):
            localize.fit2D(
                movie, movie_info, dict(CAMERA_INFO),
                real_identifications.iloc[:5], BOX,
                fitting_method="avg",
            )

    def test_avg_method_returns_locs(self, movie, movie_info,
                                     real_identifications):
        locs, info = localize.fit2D(
            movie, movie_info, dict(CAMERA_INFO, Pixelsize=130),
            real_identifications, BOX, fitting_method="avg",
        )
        assert len(locs) == len(real_identifications)
        assert info["Fit method"] == "avg"


class TestLocalizePipelineContract:
    def test_localize_matches_identify_plus_fit2d(
        self, movie, movie_info
    ):
        cam = dict(CAMERA_INFO, Pixelsize=130)
        params = {"Min. Net Gradient": MIN_NG, "Box Size": BOX}
        via_localize = localize.localize(
            np.asarray(movie[:]), cam, params,
            movie_info=list(movie_info), fitting_method="gausslq",
        )
        ids = localize.identify(
            movie, MIN_NG, BOX, return_info=False
        )
        direct, _ = localize.fit2D(
            movie, movie_info, cam, ids, BOX,
            fitting_method="gausslq",
        )
        pd.testing.assert_frame_equal(
            via_localize.reset_index(drop=True),
            direct.reset_index(drop=True),
        )

    def test_return_info_full_chain(self, movie, movie_info):
        cam = dict(CAMERA_INFO, Pixelsize=130)
        params = {"Min. Net Gradient": MIN_NG, "Box Size": BOX}
        locs, info = localize.localize(
            movie, cam, params, movie_info=list(movie_info),
            fitting_method="gausslq", return_info=True,
        )
        assert info[-1]["Fit method"] == "gausslq"
        assert any(
            "Min. Net Gradient" in blk for blk in info
        )

    def test_roi_applied_at_identification(self, movie, movie_info):
        cam = dict(CAMERA_INFO, Pixelsize=130)
        params = {"Min. Net Gradient": MIN_NG, "Box Size": BOX}
        locs = localize.localize(
            movie, cam, params, movie_info=list(movie_info),
            roi=((0, 0), (16, 16)), fitting_method="gausslq",
        )
        if len(locs):
            assert (locs["x"] < 16 + BOX).all()
            assert (locs["y"] < 16 + BOX).all()


class TestQCChecks:
    def test_check_nena_kinetics_drift(self, movie, movie_info):
        cam = dict(CAMERA_INFO, Pixelsize=130)
        params = {"Min. Net Gradient": MIN_NG, "Box Size": BOX}
        locs, info = localize.localize(
            movie, cam, params, movie_info=list(movie_info),
            fitting_method="gausslq", return_info=True,
        )
        nena = localize.check_nena(locs, info)
        assert isinstance(nena, float)
        kin = localize.check_kinetics(locs, info)
        assert kin > 0
        drift = localize.check_drift(locs, info)
        assert len(drift) == 2


class TestPicksToIdentificationsValidation:
    def test_no_n_frames_no_drift_raises(self):
        with pytest.raises((ValueError, TypeError)):
            localize.picks_to_identifications([(5.0, 5.0)])

    def test_non_list_rejected(self):
        with pytest.raises((AssertionError, TypeError, ValueError)):
            localize.picks_to_identifications(
                "not picks", n_frames=5
            )


class TestLocsToIdentifications:
    def test_window_expansion(self, movie, movie_info):
        cam = dict(CAMERA_INFO, Pixelsize=130)
        params = {"Min. Net Gradient": MIN_NG, "Box Size": BOX}
        locs = localize.localize(
            movie, cam, params, movie_info=list(movie_info),
            fitting_method="gausslq",
        )
        one = locs.iloc[:1]
        ids = localize.locs_to_identifications(
            one, movie_info, n_frames=2
        )
        # +-2 frames clipped to the movie span
        f0 = int(one["frame"].iloc[0])
        lo = max(f0 - 2, 0)
        hi = min(f0 + 2, movie_info[0]["Frames"] - 1)
        assert len(ids) == hi - lo + 1
        assert set(ids["frame"]) == set(range(lo, hi + 1))


class TestSeparableMaximaEquivalence:
    @pytest.mark.parametrize("box", [3, 5, 7, 9])
    def test_matches_naive_first_argmax_on_ties(self, box):
        """The separable 4-region local-max test must reproduce the
        naive per-neighbor definition — strictly greater than every
        EARLIER window position (row-major), >= every LATER one —
        on low-entropy integer frames full of ties."""
        from picasso_tpu.ops.identify import identify_maps

        rng = np.random.default_rng(box)
        frames = rng.integers(
            0, 4, (6, 24, 24)
        ).astype(np.float32)  # many exact ties
        got, _ = identify_maps(frames, box)
        got = np.asarray(got)

        half = box // 2
        padded = np.pad(
            frames,
            ((0, 0), (half, half), (half, half)),
            constant_values=-np.inf,
        )
        naive = np.ones(frames.shape, bool)
        k = 0
        for dy in range(-half, half + 1):
            for dx in range(-half, half + 1):
                if dy == 0 and dx == 0:
                    k += 1
                    continue
                nb = padded[
                    :,
                    half + dy:half + dy + frames.shape[1],
                    half + dx:half + dx + frames.shape[2],
                ]
                if k < (box * box) // 2:
                    naive &= frames > nb
                else:
                    naive &= frames >= nb
                k += 1
        yy, xx = np.mgrid[:24, :24]
        eligible = (
            (yy >= half) & (yy < 24 - half - 1)
            & (xx >= half) & (xx < 24 - half - 1)
        )
        np.testing.assert_array_equal(got, naive & eligible)


class TestNetGradientMXUEquivalence:
    @pytest.mark.parametrize(
        "box,shape",
        [(3, (2, 24, 24)), (7, (3, 32, 32)), (7, (2, 70, 130)),
         (9, (2, 96, 64)), (7, (2, 320, 320))],
    )
    def test_folded_kernel_matches_conv_at_eligible(self, box, shape):
        """The round-5 folded net-gradient (one rank-5 correlation of
        the frames, ops/identify._net_gradient_folded) must match the
        gradient+conv formulation to f32 eps at every ELIGIBLE pixel —
        including the first eligible row/column, where the reference's
        numba wraparound (gy row 0 reads f[Y-1]) is restored by the
        rank-1 border corrections. Non-eligible border pixels are
        don't-care (the maxima map is eligible-masked before the NG
        threshold)."""
        from picasso_tpu.ops.identify import (
            _net_gradient_conv, _net_gradient_folded,
        )

        rng = np.random.default_rng(box + shape[1])
        frames = rng.integers(80, 1100, shape).astype(np.float32)
        gy = np.roll(frames, -1, axis=1) - np.roll(frames, 1, axis=1)
        gx = np.roll(frames, -1, axis=2) - np.roll(frames, 1, axis=2)
        ref = np.asarray(
            _net_gradient_conv(jnp.asarray(gy), jnp.asarray(gx), box)
        )
        got = np.asarray(_net_gradient_folded(jnp.asarray(frames), box))
        h = box // 2
        _, Y, X = shape
        ref_e = ref[:, h:Y - h - 1, h:X - h - 1]
        got_e = got[:, h:Y - h - 1, h:X - h - 1]
        scale = np.abs(ref_e).max()
        np.testing.assert_allclose(got_e, ref_e, atol=3e-6 * scale)

    @pytest.mark.parametrize(
        "box,shape",
        [(3, (2, 24, 24)), (7, (3, 32, 32)), (7, (2, 70, 130)),
         (9, (2, 96, 64))],
    )
    def test_banded_matmul_matches_conv(self, box, shape):
        """The accelerator net-gradient path (rank-3 banded matmuls,
        ops/identify._net_gradient_mxu) must match the conv
        formulation to f32 eps on arbitrary (non-multiple-of-tile)
        frame shapes, including the roll-wraparound edge rows."""
        from picasso_tpu.ops.identify import (
            _net_gradient_conv, _net_gradient_mxu,
        )

        rng = np.random.default_rng(box + shape[1])
        frames = rng.integers(80, 1100, shape).astype(np.float32)
        gy = np.roll(frames, -1, axis=1) - np.roll(frames, 1, axis=1)
        gx = np.roll(frames, -1, axis=2) - np.roll(frames, 1, axis=2)
        ref = np.asarray(_net_gradient_conv(jnp.asarray(gy), jnp.asarray(gx), box))
        got = np.asarray(_net_gradient_mxu(jnp.asarray(gy), jnp.asarray(gx), box))
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-6 * scale)

    @pytest.mark.parametrize(
        "box,shape",
        [(3, (2, 24, 24)), (7, (3, 32, 32)), (7, (2, 70, 130)),
         (9, (2, 96, 64))],
    )
    def test_separable_fma_matches_conv(self, box, shape):
        """The VPU separable candidate (shifted static-slice FMAs,
        ops/identify._net_gradient_sep, PICASSO_TPU_NG=sep) must match
        the conv formulation to f32 eps on the same shapes."""
        from picasso_tpu.ops.identify import (
            _net_gradient_conv, _net_gradient_sep,
        )

        rng = np.random.default_rng(box + shape[1])
        frames = rng.integers(80, 1100, shape).astype(np.float32)
        gy = np.roll(frames, -1, axis=1) - np.roll(frames, 1, axis=1)
        gx = np.roll(frames, -1, axis=2) - np.roll(frames, 1, axis=2)
        ref = np.asarray(_net_gradient_conv(jnp.asarray(gy), jnp.asarray(gx), box))
        got = np.asarray(_net_gradient_sep(jnp.asarray(gy), jnp.asarray(gx), box))
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-6 * scale)


class TestLocalize3D:
    def test_localize_3d_adds_z_columns(self):
        """localize_3D = 2D localize + astigmatism z fit in one call
        (reference picasso/localize.py:1818): the result must carry
        the 2D fit columns plus z/d_zcalib/lpz, with z finite for
        well-formed spots."""
        from tests.conftest import CALIB_3D
        from picasso_tpu import localize, simulate

        movie, _, _ = simulate.simulate_movie(
            n_sites=15, imagesize=48, frames=40, taud=1500,
            photonrate=70, seed=21,
        )
        movie = (movie + 100).astype(np.uint16)
        movie_info = [{
            "Frames": len(movie), "Width": 48, "Height": 48,
            "Data Type": "uint16", "Byte Order": "<",
        }]
        camera = {
            "Baseline": 100, "Sensitivity": 0.5, "Gain": 1,
            "Pixelsize": 130,
        }
        locs, info = localize.localize_3D(
            movie,
            movie_info=movie_info,
            camera_info=camera,
            box=7,
            minimum_ng=3000,
            calibration_3d=CALIB_3D,
            fitting_method="gaussmle",
        )
        assert len(locs) > 10
        for col in ("x", "y", "z", "d_zcalib", "lpz"):
            assert col in locs.columns, col
        assert np.isfinite(locs["z"].to_numpy()).any()
        # provenance chain gained the z-fit block
        assert any("Generated by" in blk and isinstance(blk, dict)
                   for blk in info)


class TestCompactionBucket:
    """The scatter compaction must behave exactly at the bucket
    boundary: true count reported even when it exceeds the bucket,
    the first `size` hits kept in scan order, and the public
    identify retry recovering the full set."""

    def _movie(self, n_spots):
        rng = np.random.default_rng(9)
        fr = rng.poisson(30, (1, 128, 128)).astype(np.uint16)
        # plant spots on a grid with > box separation
        k = 0
        for yy in range(6, 122, 9):
            for xx in range(6, 122, 9):
                if k >= n_spots:
                    break
                fr[0, yy - 1:yy + 2, xx - 1:xx + 2] += 400
                fr[0, yy, xx] += 1200
                k += 1
        return fr

    def test_count_exceeds_bucket(self):
        import jax.numpy as jnp

        from picasso_tpu.ops.identify import _identify_compact

        fr = self._movie(60)
        full = _identify_compact(jnp.asarray(fr), 2000.0, 7, 256)
        n_true = int(full[0])
        assert n_true >= 60
        small = _identify_compact(jnp.asarray(fr), 2000.0, 7, 32)
        assert int(small[0]) == n_true  # true count, not clamped
        # the 32 slots hold the FIRST 32 hits in scan order
        for a, b in zip(small[1:4], full[1:4]):
            np.testing.assert_array_equal(
                np.asarray(a)[:32], np.asarray(b)[:32]
            )

    def test_exact_bucket_boundary(self):
        import jax.numpy as jnp

        from picasso_tpu.ops.identify import _identify_compact

        fr = self._movie(200)
        res = _identify_compact(jnp.asarray(fr), 2000.0, 7, 1024)
        n_true = int(res[0])
        size = 1 << (n_true - 1).bit_length()
        if size == n_true:  # make the boundary exact regardless
            exact = _identify_compact(
                jnp.asarray(fr), 2000.0, 7, n_true
            )
        else:
            exact = _identify_compact(
                jnp.asarray(fr), 2000.0, 7, int(n_true)
            )
        assert int(exact[0]) == n_true
        f = np.asarray(exact[1])
        assert (f >= 0).all()  # no fill rows at an exact-fit bucket

    def test_public_identify_retries_past_hint(self):
        from picasso_tpu import localize
        from picasso_tpu.ops import identify as ops_identify

        fr = self._movie(120)
        ops_identify._BUCKET_HINT[fr.shape] = 16  # force undershoot
        try:
            ids = localize.identify(fr, 2000, 7, return_info=False)
        finally:
            ops_identify._BUCKET_HINT.pop(fr.shape, None)
        assert len(ids) >= 120
