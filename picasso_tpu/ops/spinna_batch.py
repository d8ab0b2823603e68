"""picasso_tpu.ops.spinna_batch — batched device SPINNA candidate
scoring.

The reference farms candidate scoring to a ProcessPool
(picasso/spinna.py:3280 fit_stoichiometry_parallel): each candidate
stoichiometry is simulated with numpy, NND'd with a KDTree and scored
with scipy's ks_2samp. Here the *entire* pipeline for a batch of
candidates — structure placement (CSR or mask-multinomial), random
rigid-body rotations, label-uncertainty jitter, exact-count labeling-
efficiency thinning, masked k-NN distances and the 2-sample KS
statistic against the experimental NNDs — is one jitted XLA program,
vmapped over candidates. Varying molecule counts become static padded
shapes plus validity masks (counts are bucketed to powers of two so
the program compiles once per search-space scale).

Simulation randomness uses jax.random (seeded from numpy's global
state so ``np.random.seed`` keeps tests reproducible); scores agree
with the serial numpy scorer in distribution, not bit-for-bit — the
equivalence tests in tests/test_spinna_batch.py are statistical.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from picasso_tpu.ops.neighbors import knn_masked, ks_2samp_masked

def _tile_budget() -> int:
    """Cap on live f32 elements in one distance tile
    (B2 x P1 x block). ~2 GB on TPU (16 GB HBM leaves headroom for
    XLA temporaries); small on CPU so the virtual-mesh test runs stay
    lean."""
    return (
        1_500_000_000
        if jax.default_backend() == "tpu"
        else 24_000_000
    )


_NN_BLOCK = 512


def _bucket(n: int) -> int:
    """Next power of two (>= 8) so padded shapes are reused across
    coarse/fine/bootstrap calls instead of recompiling per subset."""
    b = 8
    while b < n:
        b *= 2
    return b


def _rotations(key, mode, shape):
    """Random rotation matrices (..., 3, 3): in-plane for '2D',
    uniform SO(3) (normalized-quaternion method) for '3D', identity
    for None — matching spinna.random_rotation_matrices."""
    if mode is None:
        return jnp.broadcast_to(jnp.eye(3), shape + (3, 3))
    if mode == "2D":
        ang = jax.random.uniform(key, shape, maxval=2 * jnp.pi)
        c, s = jnp.cos(ang), jnp.sin(ang)
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        return jnp.stack(
            [
                jnp.stack([c, -s, z], -1),
                jnp.stack([s, c, z], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )
    # 3D: a normalized 4D Gaussian is uniform on S^3 = uniform SO(3)
    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)], -1),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)], -1),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


class BatchedScorer:
    """Scores SPINNA candidate stoichiometries in device batches.

    Built once per (mixer, search-space scale); ``score(N_rows, key)``
    evaluates any number of candidates by chunking them through one
    compiled program. Mirrors SPINNA._evaluate_single semantics:
    per-pair KS statistics averaged over target pairs and neighbor
    orders, empty pairs skipped, 1.0 when nothing scores.
    """

    def __init__(
        self, mixer, dists_gt, N_sim: int, max_counts,
        max_points=None,
    ):
        """``max_counts``: per-structure max candidate count over the
        search space (sets per-structure padding). ``max_points``:
        optional per-target max TOTAL placed points over candidates
        (Σ_s count_s·M_st) — conserved-total search spaces make this
        much tighter than the per-structure pad sum, and simulated
        populations are compacted down to it on device before the
        O(P1·P2) distance tiles."""
        self.mixer = mixer
        self.N_sim = int(N_sim)
        self.n_structures = len(mixer.structures)
        targets = mixer.targets
        self.is_3d = mixer.roi[2] is not None or (
            mixer.mask_dict is not None
            and any(
                np.ndim(m) == 3
                for m in mixer.mask_dict.get("masks", {}).values()
            )
        )
        self.dim = 3 if self.is_3d else 2

        # per-structure static spec
        self.N_pad = [
            _bucket(int(c)) for c in np.maximum(max_counts, 1)
        ]
        self.spec = []
        for si, structure in enumerate(mixer.structures):
            le = mixer._per_target(mixer.le, structure.targets)
            unc = mixer._per_target(
                mixer.label_unc, structure.targets
            )
            mask, mask_info = mixer.extract_mask(structure)
            tmpl = {}
            for ti, t in enumerate(structure.targets):
                tmpl[t] = (
                    np.stack(
                        [
                            np.asarray(structure.x[t], np.float64),
                            np.asarray(structure.y[t], np.float64),
                            np.asarray(structure.z[t], np.float64),
                        ],
                        axis=1,
                    ).astype(np.float32),
                    float(le[ti]),
                    float(unc[ti]),
                )
            self.spec.append(
                {
                    "templates": tmpl,
                    "mask": (
                        None if mask is None
                        else np.asarray(mask, np.float32)
                    ),
                    "binsize": (
                        None if mask is None
                        else float(
                            (mask_info or {}).get(
                                "Binsize (nm)", 100.0
                            )
                        )
                    ),
                }
            )

        # relevant target pairs and their experimental NNDs
        self.pairs = []  # (t1_idx, t2_idx, order j, gt_sorted)
        self.pair_keys = []  # (t1_idx, t2_idx, n) per simulated kNN
        neighbor_idx = mixer.get_neighbor_idx(duplicate=False)
        gi = 0
        for t1, t2, n in neighbor_idx:
            if not n:
                continue
            gt = np.asarray(dists_gt[gi], np.float32)
            gi += 1
            i1, i2 = targets.index(t1), targets.index(t2)
            self.pair_keys.append((i1, i2, n))
            for j in range(n):
                if gt.shape[0] and j < gt.shape[1]:
                    self.pairs.append(
                        (len(self.pair_keys) - 1, j,
                         jnp.asarray(np.sort(gt[:, j])))
                    )
        self.targets = targets

        # per-target padded point counts: the raw concatenation width
        # (sum of per-structure pads) and the compacted width the
        # distance tiles actually see
        self.P_cat = []
        for t in targets:
            p = 0
            for si, s in enumerate(mixer.structures):
                if t in self.spec[si]["templates"]:
                    M = self.spec[si]["templates"][t][0].shape[0]
                    p += self.N_pad[si] * M
            self.P_cat.append(max(p, 1))
        if max_points is not None:
            self.P = [
                min(pc, _bucket(int(max(mp, 1))))
                for pc, mp in zip(self.P_cat, max_points)
            ]
        else:
            self.P = list(self.P_cat)

        p_max = max(self.P)
        block = min(_NN_BLOCK, p_max)
        # ~3 live (P1, block) copies exist through the top-k merge
        # (distance tile, merged working set, knockout mask)
        per_cand = 3 * p_max * block * max(1, self.N_sim)
        self.chunk = int(
            np.clip(_tile_budget() // max(per_cand, 1), 1, 512)
        )
        # multi-chip: shard the candidate axis over all devices of
        # the default backend (the mesh analogue of the reference's
        # ProcessPool, picasso/spinna.py:3280). The chunk padded to a
        # device multiple keeps ONE compiled program; partitionable
        # threefry makes results identical to single-chip.
        self._sharding = None
        devices = jax.devices()
        if len(devices) > 1 and os.environ.get(
            "PICASSO_TPU_SPINNA_MESH", "auto"
        ) != "off":
            from jax.sharding import (
                Mesh, NamedSharding, PartitionSpec,
            )

            n_dev = len(devices)
            self.chunk = -(-self.chunk // n_dev) * n_dev
            mesh = Mesh(np.array(devices), axis_names=("spots",))
            self._sharding = NamedSharding(
                mesh, PartitionSpec("spots", None)
            )
        self._compiled = self._build()

    # -- simulation of one structure population, batched --
    def _simulate_structure(self, si, counts, key):
        """counts: (B2,) device int32. Returns {target: (coords
        (B2, N_pad*M, 3), keep_mask (B2, N_pad*M))}."""
        spec = self.spec[si]
        n_pad = self.N_pad[si]
        mixer = self.mixer
        k_c, k_r, k_t = jax.random.split(key, 3)
        B2 = counts.shape[0]
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (B2, n_pad), 1)
            < counts[:, None]
        )
        # centers
        if spec["mask"] is not None:
            mask = spec["mask"]
            binsize = spec["binsize"]
            p = jnp.asarray(mask.ravel())
            logits = jnp.where(p > 0, jnp.log(p), -jnp.inf)
            bins = jax.random.categorical(
                k_c, logits[None, :], shape=(B2, n_pad)
            )
            sub = jax.random.uniform(
                jax.random.fold_in(k_c, 1), (B2, n_pad, mask.ndim)
            )
            idx = jnp.stack(
                jnp.unravel_index(bins, mask.shape), axis=-1
            ).astype(jnp.float32)
            # mask layout is (y, x[, z]); coordinates are (x, y, z)
            pos_yx = (idx + sub) * binsize
            if mask.ndim == 2:
                centers = jnp.stack(
                    [pos_yx[..., 1], pos_yx[..., 0],
                     jnp.zeros((B2, n_pad))], -1)
            else:
                centers = jnp.stack(
                    [pos_yx[..., 1], pos_yx[..., 0],
                     pos_yx[..., 2]], -1)
        else:
            width, height, depth = mixer.roi
            u = jax.random.uniform(k_c, (B2, n_pad, 3))
            cx = u[..., 0] * width
            cy = u[..., 1] * height
            if depth is not None:
                cz = (u[..., 2] - 0.5) * depth
            else:
                cz = jnp.zeros((B2, n_pad))
            centers = jnp.stack([cx, cy, cz], -1)
        rot = _rotations(k_r, mixer.random_rot_mode, (B2, n_pad))

        out = {}
        for tno, (t, (tmpl, le, unc)) in enumerate(
            spec["templates"].items()
        ):
            M = tmpl.shape[0]
            k_j, k_l = jax.random.split(
                jax.random.fold_in(k_t, tno)
            )
            pts = jnp.einsum(
                "bnij,mj->bnmi", rot, jnp.asarray(tmpl)
            )
            pts = pts + centers[:, :, None, :]
            pts = pts + max(unc, 1e-12) * jax.random.normal(
                k_j, pts.shape
            )
            flat = pts.reshape(B2, n_pad * M, 3)
            vmask = jnp.repeat(valid, M, axis=1)
            # exact-count LE thinning: keep the floor(n_valid*le)
            # smallest random keys among valid points
            # (reference picasso/spinna.py:1946 uses
            # np.random.choice without replacement)
            u = jax.random.uniform(k_l, (B2, n_pad * M))
            u = jnp.where(vmask, u, jnp.inf)
            n_valid = jnp.sum(vmask, axis=1)
            k_keep = jnp.floor(
                n_valid.astype(jnp.float32) * np.float32(le)
            ).astype(jnp.int32)
            su = jnp.sort(u, axis=1)
            kth = jnp.take_along_axis(
                su, jnp.maximum(k_keep - 1, 0)[:, None], axis=1
            )
            keep = vmask & (u <= kth) & (k_keep[:, None] > 0)
            out[t] = (flat, keep)
        return out

    def _build(self):
        """Compile the chunk scorer: (chunk, n_s) counts + key ->
        (chunk,) scores."""
        n_sim = max(1, self.N_sim)
        pair_keys = self.pair_keys
        pairs = self.pairs
        dim = self.dim

        def score_chunk(counts, key):
            B = counts.shape[0]
            B2 = B * n_sim
            counts2 = jnp.repeat(counts, n_sim, axis=0)
            keys = jax.random.split(key, self.n_structures)
            per_target = {t: [] for t in self.targets}
            for si in range(self.n_structures):
                sim = self._simulate_structure(
                    si, counts2[:, si], keys[si]
                )
                for t, cm in sim.items():
                    per_target[t].append(cm)
            coords, masks = {}, {}
            for ti, t in enumerate(self.targets):
                parts = per_target[t]
                if parts:
                    c = jnp.concatenate(
                        [c for c, _ in parts], axis=1
                    )[..., :dim]
                    m = jnp.concatenate(
                        [m for _, m in parts], axis=1
                    )
                    p_out = self.P[ti]
                    if c.shape[1] > p_out:
                        # compact valid points to the front (stable)
                        # and crop to the search space's true max
                        order = jnp.argsort(~m, axis=1, stable=True)
                        order = order[:, :p_out]
                        c = jnp.take_along_axis(
                            c, order[:, :, None], axis=1
                        )
                        m = jnp.take_along_axis(m, order, axis=1)
                    coords[t] = c
                    masks[t] = m
                else:
                    coords[t] = jnp.zeros((B2, 1, dim))
                    masks[t] = jnp.zeros((B2, 1), bool)

            # simulated kNN distances per relevant pair
            knn_by_pair = []
            eff_mask_by_pair = []
            for (i1, i2, n) in pair_keys:
                t1, t2 = self.targets[i1], self.targets[i2]
                c1, m1 = coords[t1], masks[t1]
                c2, m2 = coords[t2], masks[t2]
                block = min(_NN_BLOCK, c2.shape[1])
                d = jax.vmap(
                    lambda a, b, am, bm: knn_masked(
                        a, b, am, bm, n,
                        exclude_self=(t1 == t2), b_block=block,
                    )
                )(c1, c2, m1, m2)
                # a sim whose t2 population is empty contributes
                # nothing (the serial path skips it per-sim)
                n2 = jnp.sum(m2, axis=1)
                eff = m1 & (n2 > 0)[:, None]
                P1 = c1.shape[1]
                knn_by_pair.append(
                    d.reshape(B, n_sim * P1, n)
                )
                eff_mask_by_pair.append(
                    eff.reshape(B, n_sim * P1)
                )

            # KS statistics, averaged over valid (pair, order)
            total = jnp.zeros((B,))
            n_scored = jnp.zeros((B,))
            for pk, j, gt_sorted in pairs:
                sample = knn_by_pair[pk][:, :, j]
                m = eff_mask_by_pair[pk]
                stat = jax.vmap(
                    lambda s, mm: ks_2samp_masked(s, mm, gt_sorted)
                )(sample, m)
                ok = jnp.sum(m, axis=1) > 0
                total = total + jnp.where(ok, stat, 0.0)
                n_scored = n_scored + ok
            return jnp.where(
                n_scored > 0, total / jnp.maximum(n_scored, 1), 1.0
            )

        return jax.jit(score_chunk)

    def score(self, N_rows, seed=None, progress=None) -> np.ndarray:
        """Score candidates (N, n_structures) -> (N,) float scores.

        ``progress(done)`` is called after each device chunk.
        """
        N_rows = np.asarray(N_rows, np.int32)
        if N_rows.ndim == 1:
            N_rows = N_rows.reshape(1, -1)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.PRNGKey(seed)
        n = len(N_rows)
        out = np.empty(n, np.float64)
        # dispatch every chunk before reading any back: JAX queues the
        # programs asynchronously, so device compute pipelines instead
        # of paying one host<->device round-trip of latency per chunk
        pending = []
        for start in range(0, n, self.chunk):
            stop = min(start + self.chunk, n)
            chunk = N_rows[start:stop]
            if len(chunk) < self.chunk:
                pad = np.zeros(
                    (self.chunk - len(chunk), chunk.shape[1]),
                    np.int32,
                )
                chunk = np.concatenate([chunk, pad])
            key, sub = jax.random.split(key)
            dev_chunk = (
                jax.device_put(chunk, self._sharding)
                if self._sharding is not None
                else jnp.asarray(chunk)
            )
            pending.append(
                (start, stop, self._compiled(dev_chunk, sub))
            )
        for start, stop, scores in pending:
            out[start:stop] = np.asarray(scores)[: stop - start]
            if progress is not None:
                progress(stop)
        return out
