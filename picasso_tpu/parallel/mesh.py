"""Device-mesh execution of the localization pipeline.

Design: localization workloads are embarrassingly parallel over spots
and frames, so the natural mesh is a 1D ``("spots",)`` data axis; the
MLE/LQ kernels need no collectives at all (XLA partitions the batch),
while rendering reduces per-device partial histograms with a psum over
ICI. This replaces the reference's single-host thread/process pools
(picasso/localize.py:482-558, gaussmle.py:478-530) as the scaling
mechanism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from picasso_tpu.ops import mle as _mle


def default_mesh(devices=None) -> Mesh:
    """1D mesh over all available devices, axis name 'spots'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=("spots",))


def _pad_to(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def fit_mle_sharded(
    spots: np.ndarray,
    eps: float = 0.001,
    max_it: int = 100,
    method: str = "sigmaxy",
    mesh: Mesh | None = None,
):
    """Run the batched MLE fit with the spot batch sharded over the
    mesh. Per-spot independence means XLA partitions the whole program
    with zero communication; each chip fits its shard.

    Returns (thetas, CRLBs, log_likelihoods, iterations) gathered to
    host, truncated to the input length.
    """
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    n = len(spots)
    spots = np.asarray(spots, np.float32)
    padded_n = _pad_to(max(n, 1), 8 * n_dev)
    if padded_n != n:
        spots = np.concatenate(
            [spots, np.ones((padded_n - n, *spots.shape[1:]), np.float32)]
        )
    sharding = NamedSharding(mesh, P("spots", None, None))
    spots_dev = jax.device_put(spots, sharding)
    fitted = jax.jit(
        functools.partial(
            _mle._fit_chunk, eps=eps, max_it=max_it, method=method
        ),
        in_shardings=(sharding,),
        out_shardings=NamedSharding(mesh, P("spots")),
    )(spots_dev)
    theta, crlb, ll, iters = (np.asarray(x)[:n] for x in fitted)
    return theta, crlb, ll, iters


def render_hist_sharded(
    x: np.ndarray,
    y: np.ndarray,
    shape: tuple[int, int],
    mesh: Mesh | None = None,
) -> np.ndarray:
    """2D histogram of localization coordinates with the loc batch
    sharded over the mesh; per-device partial images are psum-reduced
    over ICI (shard_map + psum)."""
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    n = len(x)
    padded_n = _pad_to(max(n, 1), n_dev)
    pad = padded_n - n
    # Pad with out-of-range coords so they drop out of the histogram.
    x = np.concatenate([np.asarray(x, np.float32), np.full(pad, -1e9, np.float32)])
    y = np.concatenate([np.asarray(y, np.float32), np.full(pad, -1e9, np.float32)])

    H, W = shape

    def partial_hist(xs, ys):
        xi = jnp.floor(xs).astype(jnp.int32)
        yi = jnp.floor(ys).astype(jnp.int32)
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = jnp.where(ok, yi * W + xi, H * W)  # overflow bucket
        img = jnp.zeros(H * W + 1, jnp.float32).at[flat].add(1.0)
        img = jax.lax.psum(img[: H * W], axis_name="spots")
        return img.reshape(H, W)

    sharding = NamedSharding(mesh, P("spots"))
    fn = jax.jit(
        jax.shard_map(
            partial_hist,
            mesh=mesh,
            in_specs=(P("spots"), P("spots")),
            out_specs=P(),
        )
    )
    return np.asarray(fn(jax.device_put(x, sharding),
                         jax.device_put(y, sharding)))


def sharded_pipeline_step(
    frames: np.ndarray,
    box: int,
    eps: float = 0.001,
    max_it: int = 20,
    mesh: Mesh | None = None,
):
    """One full sharded pipeline step (the 'training step' analogue for
    this framework): frames are sharded over the mesh, each device
    computes identification maps and fits a fixed-size spot batch cut
    from its shard, and a rendered histogram is psum-reduced across
    the mesh. Exercises data-parallel sharding + an ICI collective in
    one jitted program; used by __graft_entry__.dryrun_multichip."""
    from picasso_tpu.ops.identify import identify_maps

    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    B, Y, X = frames.shape
    assert B % n_dev == 0, "frame batch must divide the mesh"
    spots_per_frame = 4  # fixed-size top-k per frame keeps shapes static

    def step(local_frames):
        maxima, ng = identify_maps(local_frames, box)
        score = jnp.where(maxima, ng, -jnp.inf)
        nb, ny, nx = score.shape
        flat = score.reshape(nb, ny * nx)
        _, top_idx = jax.lax.top_k(flat, spots_per_frame)
        yy = top_idx // nx
        xx = top_idx % nx
        half = box // 2
        yy = jnp.clip(yy, half, ny - half - 1)
        xx = jnp.clip(xx, half, nx - half - 1)

        def cut(frame, ys, xs):
            def one(y0, x0):
                return jax.lax.dynamic_slice(
                    frame, (y0 - half, x0 - half), (box, box)
                )
            return jax.vmap(one)(ys, xs)

        spots = jax.vmap(cut)(local_frames, yy, xx)
        spots = spots.reshape(-1, box, box)
        theta, crlb, ll, iters = _mle._fit_chunk(
            spots, eps, max_it, method="sigmaxy"
        )
        # Cross-chip reduction: a coarse rendered histogram of the
        # fitted positions, summed over the mesh via ICI.
        xi = jnp.clip(
            jnp.floor(theta[:, 0]).astype(jnp.int32), 0, box - 1
        )
        yi = jnp.clip(
            jnp.floor(theta[:, 1]).astype(jnp.int32), 0, box - 1
        )
        img = jnp.zeros(box * box, jnp.float32).at[yi * box + xi].add(1.0)
        img = jax.lax.psum(img, axis_name="spots")
        return theta, img.reshape(box, box)

    sharding = NamedSharding(mesh, P("spots", None, None))
    fn = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P("spots", None, None),),
            out_specs=(P("spots"), P()),
        )
    )
    frames_dev = jax.device_put(
        np.asarray(frames, np.float32), sharding
    )
    theta, img = fn(frames_dev)
    return np.asarray(theta), np.asarray(img)


def fit_lq_sharded(
    spots: np.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Run the batched Levenberg-Marquardt (LQ) fit with the spot batch
    sharded over the mesh — the multi-chip counterpart of the
    reference's process pool / CUDA Gpufit paths
    (picasso/gausslq.py:292/:346). Zero collectives: each chip fits its
    shard. Returns theta (N, 6) gathered to host."""
    from picasso_tpu.ops import lq as _lq

    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    n = len(spots)
    spots = np.asarray(spots, np.float32)
    padded_n = _pad_to(max(n, 1), 8 * n_dev)
    if padded_n != n:
        spots = np.concatenate(
            [spots, np.ones((padded_n - n, *spots.shape[1:]), np.float32)]
        )
    sharding = NamedSharding(mesh, P("spots", None, None))
    spots_dev = jax.device_put(spots, sharding)
    theta = jax.jit(
        functools.partial(_lq._fit_chunk, max_it=max_it, ftol=ftol),
        in_shardings=(sharding,),
        out_shardings=NamedSharding(mesh, P("spots")),
    )(spots_dev)
    return np.asarray(theta)[:n]


def pair_xcorrs_sharded(
    segments: np.ndarray,
    pairs_i: np.ndarray,
    pairs_j: np.ndarray,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Cross-correlation maps of segment pairs for RCC drift
    correction, sharded over the PAIR axis — for large segmentations
    the n(n-1)/2 pair FFTs dominate undrift (picasso/imageprocess.py:
    160 runs them serially on host). Segment FFTs are computed once and
    replicated; each chip evaluates its share of the pair products.
    Returns the fftshifted correlation maps (n_pairs, Y, X) on host."""
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    n_pairs = len(pairs_i)
    pad = _pad_to(max(n_pairs, 1), n_dev)
    ii = np.zeros(pad, np.int32)
    jj = np.zeros(pad, np.int32)
    ii[:n_pairs] = pairs_i
    jj[:n_pairs] = pairs_j
    seg = np.asarray(segments, np.float32)
    replicated = NamedSharding(mesh, P())
    pair_sharding = NamedSharding(mesh, P("spots"))

    def xcorr_pairs(seg_arr, idx_i, idx_j):
        F = jnp.fft.fft2(seg_arr)
        prod = F[idx_i] * jnp.conj(F[idx_j])
        size = seg_arr.shape[1] * seg_arr.shape[2]
        res = jnp.real(jnp.fft.ifft2(prod)) / jnp.sqrt(
            jnp.asarray(size, jnp.float32)
        )
        return jnp.fft.fftshift(res, axes=(1, 2))

    out = jax.jit(
        xcorr_pairs,
        in_shardings=(replicated, pair_sharding, pair_sharding),
        out_shardings=NamedSharding(mesh, P("spots")),
    )(
        jax.device_put(seg, replicated),
        jax.device_put(ii, pair_sharding),
        jax.device_put(jj, pair_sharding),
    )
    return np.asarray(out)[:n_pairs]


def spinna_score_sharded(
    scorer,
    N_rows: np.ndarray,
    seed: int | None = None,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Score SPINNA candidate stoichiometries with the CANDIDATE axis
    sharded over the mesh — the multi-chip counterpart of the
    reference's ProcessPool over candidates
    (picasso/spinna.py:3280 fit_stoichiometry_parallel).

    ``scorer`` is an ops.spinna_batch.BatchedScorer; its compiled
    chunk program is batch-parallel over candidates, so sharding the
    input rows partitions the whole simulate+NND+KS pipeline with zero
    collectives. JAX's partitionable threefry RNG makes the scores
    bit-identical to an unsharded evaluation of the same padded batch
    with the same key (tests/test_parallel.py pins this).
    """
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    N_rows = np.asarray(N_rows, np.int32)
    if N_rows.ndim == 1:
        N_rows = N_rows.reshape(1, -1)
    n = len(N_rows)
    pad = _pad_to(max(n, 1), n_dev)
    rows = np.zeros((pad, N_rows.shape[1]), np.int32)
    rows[:n] = N_rows
    if seed is None:
        seed = int(np.random.randint(0, 2**31 - 1))
    key = jax.random.PRNGKey(seed)
    sharding = NamedSharding(mesh, P("spots", None))
    counts = jax.device_put(rows, sharding)
    scores = scorer._compiled(counts, key)
    return np.asarray(scores)[:n]


def fit_g5m_clusters_sharded(
    X: np.ndarray,
    mask: np.ndarray,
    lp: np.ndarray,
    key=None,
    *,
    K: int,
    sigma_bounds,
    isotropic: bool = True,
    loc_local: bool = False,
    n_init: int = 1,
    min_locs: int = 4,
    mesh: Mesh | None = None,
):
    """Batched g5m GMM-EM with the CLUSTER axis sharded over the mesh
    — the multi-chip counterpart of the reference's per-cluster
    ProcessPool (picasso/g5m.py:2365 _run_g5m_parallel). Every EM
    quantity in ops.gmm carries a leading cluster axis and nothing
    reduces across clusters except the boolean all-converged check in
    the while_loop cond, so XLA partitions the fit with one tiny
    collective per iteration.

    Inputs follow ops.gmm.fit_g5m_batched: X (G, P, D), mask (G, P),
    lp (G, P) or (G, P, D). Padding clusters (copies of cluster 0)
    keep the EM math finite and are trimmed from every output.
    """
    from picasso_tpu.ops import gmm

    if mesh is None:
        mesh = default_mesh()
    if key is None:
        key = jax.random.PRNGKey(0)
    n_dev = mesh.devices.size
    X = np.asarray(X, np.float32)
    mask = np.asarray(mask, bool)
    lp = np.asarray(lp, np.float32)
    G = len(X)
    padG = _pad_to(max(G, 1), n_dev)
    if padG != G:
        reps = padG - G
        X = np.concatenate([X, np.repeat(X[:1], reps, axis=0)])
        mask = np.concatenate(
            [mask, np.repeat(mask[:1], reps, axis=0)]
        )
        lp = np.concatenate([lp, np.repeat(lp[:1], reps, axis=0)])

    def shard(a):
        spec = P("spots", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    out = gmm.fit_g5m_batched(
        shard(X), shard(mask), shard(lp), key,
        K=K, sigma_bounds=sigma_bounds, isotropic=isotropic,
        loc_local=loc_local, n_init=n_init, min_locs=min_locs,
    )
    return tuple(np.asarray(o)[:G] for o in out)


_FUSED_CHAIN_CACHE: dict = {}


def fused_chain_program(
    mesh: Mesh,
    per_dev: int,
    box: int,
    size: int,
    eps: float,
    max_it: int,
    method: str,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Jitted dispatch-only fused chain over the mesh: every device
    runs identify+cut+fit (ops/fused.identify_cut_fit) on its local
    frame shard; no collectives, no host sync. Cached per
    configuration so streamed callers (ops/fused.localize_fused) pay
    one compile per chunk shape.

    Call as ``prog(frames_dev, ng_thresh, baseline, factor)`` with
    ``frames_dev`` placed as P('spots', None, None); returns
    per-device stacked ``(count, f, y, x, ng, theta, crlb, ll,
    iters)`` with global frame indices and the per-shard hit buckets
    padded to ``size``.
    """
    key = (
        mesh, per_dev, box, size, eps, max_it, method, use_pallas,
        pallas_interpret,
    )
    prog = _FUSED_CHAIN_CACHE.get(key)
    if prog is not None:
        return prog

    from picasso_tpu.ops.fused import identify_cut_fit

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("spots", None, None), P(), P(), P()),
        out_specs=(
            (P("spots"),) * 5
            + (P("spots", None, None),) * 2
            + (P("spots"),) * 2
        ),
        # pallas_call outputs carry no varying-mesh-axes annotation,
        # which the vma check rejects; the chain is purely
        # data-parallel (no collectives) so nothing is lost — but
        # keep the check on for the XLA-core path
        check_vma=not use_pallas,
    )
    def _shard_chain(f_shard, ng_thresh, baseline, factor):
        count, f, y, x, ng, theta, crlb, ll, iters = (
            identify_cut_fit(
                f_shard, ng_thresh, baseline, factor,
                box=box, size=size, eps=eps, max_it=max_it,
                method=method, use_pallas=use_pallas,
                pallas_interpret=pallas_interpret,
            )
        )
        offset = jax.lax.axis_index("spots") * per_dev
        f = jnp.where(f >= 0, f + offset, -1)
        return (
            count[None], f[None], y[None], x[None], ng[None],
            theta[None], crlb[None], ll[None], iters[None],
        )

    prog = jax.jit(_shard_chain)
    _FUSED_CHAIN_CACHE[key] = prog
    return prog


def localize_fused_sharded(
    frames: np.ndarray,
    minimum_ng: float,
    box: int,
    camera_info: dict,
    mesh: Mesh | None = None,
    bucket: int = 4096,
    method: str = "lq",
    eps: float = 1e-3,
    max_it: int = 100,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """The flagship fused identify+cut+fit chain (ops/fused.py) with
    the FRAME batch sharded over the mesh: every device runs the whole
    per-chunk program — identify maps, scatter compaction, ROI gather,
    photon conversion and the Gaussian fit — on its local frame shard;
    zero collectives, only the per-device result buckets travel.
    Multi-chip counterpart of the reference's single-host localize
    orchestration (picasso/localize.py:1682).

    Returns flat frame-sorted numpy arrays
    ``(frame, y, x, net_gradient, theta (N, 6), crlb (N, 6), ll,
    iterations)``. Spot fits freeze on convergence, so grouping does
    not change results: theta/ll/iterations are bit-identical to the
    single-device fused chain and the CRLB matches to f32 rounding
    (the Fisher contraction compiles with different FMA choices under
    shard_map; measured <=2 ULP).
    """
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    frames = np.asarray(frames)
    n_frames = len(frames)
    per_dev = -(-max(n_frames, 1) // n_dev)
    pad = per_dev * n_dev - n_frames
    if pad:
        frames = np.concatenate(
            [frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)]
        )
    sharding = NamedSharding(mesh, P("spots", None, None))
    frames_dev = jax.device_put(frames, sharding)
    ng_thresh = jnp.float32(minimum_ng)
    baseline = jnp.float32(float(camera_info.get("Baseline", 0)))
    factor = jnp.float32(
        float(camera_info.get("Sensitivity", 1))
        / float(camera_info.get("Gain", 1))
    )

    size = bucket
    if use_pallas:
        # Pallas buckets must be 512-lane tile multiples
        size = max(512, -(-size // 512) * 512)
    while True:
        prog = fused_chain_program(
            mesh, per_dev, box, size, eps, max_it, method,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        )
        res = prog(frames_dev, ng_thresh, baseline, factor)
        counts = np.asarray(res[0])
        if counts.max(initial=0) <= size:
            break
        size = 1 << (int(counts.max()) - 1).bit_length()
        if use_pallas:
            size = max(size, 512)  # Pallas tiles are 512 lanes

    _, f, y, x, ng, theta, crlb, ll, iters = map(np.asarray, res)
    out: list[list] = [[] for _ in range(8)]
    for d in range(n_dev):
        n = int(counts[d])
        if n == 0:
            continue
        out[0].append(f[d, :n].astype(np.int64))
        out[1].append(y[d, :n].astype(np.int64))
        out[2].append(x[d, :n].astype(np.int64))
        out[3].append(ng[d, :n].astype(np.float32))
        out[4].append(theta[d, :, :n].T)
        out[5].append(crlb[d, :, :n].T)
        out[6].append(ll[d, :n])
        out[7].append(iters[d, :n])
    if not out[0]:
        e = np.zeros(0, np.int64)
        e6 = np.zeros((0, 6), np.float32)
        return (
            e, e, e, np.zeros(0, np.float32), e6, e6,
            np.zeros(0, np.float32), np.zeros(0, np.int32),
        )
    cat = [np.concatenate(o) for o in out]
    keep = cat[0] < n_frames  # drop hits from frame padding
    return tuple(c[keep] for c in cat)


def identify_sharded(
    frames: np.ndarray,
    minimum_ng: float,
    box: int,
    mesh: Mesh | None = None,
    bucket: int = 4096,
):
    """Spot identification with the FRAME batch sharded over the mesh
    (SURVEY P1 multi-chip): every device runs the max-filter +
    net-gradient maps and a local compaction on its frame shard; only
    the per-device hit buckets travel. Mirrors the single-chip
    ops.identify.identify_frames contract (reference threaded
    identification, picasso/localize.py:482-519).

    Returns flat (frame, y, x, net_gradient) numpy arrays sorted by
    frame, identical to the single-device path.
    """
    from picasso_tpu.ops.identify import _identify_compact

    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    frames = np.asarray(frames)
    n_frames = len(frames)
    per_dev = -(-max(n_frames, 1) // n_dev)
    pad = per_dev * n_dev - n_frames
    if pad:
        # zero frames produce no local maxima above threshold
        frames = np.concatenate(
            [frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)]
        )
    sharding = NamedSharding(mesh, P("spots", None, None))
    frames_dev = jax.device_put(frames, sharding)
    ng_thresh = jnp.float32(minimum_ng)

    size = bucket
    while True:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("spots", None, None),),
            out_specs=(P("spots"),) * 5,
        )
        def _shard_identify(f_shard):
            count, f, y, x, ng = _identify_compact(
                f_shard, ng_thresh, box, size
            )
            offset = jax.lax.axis_index("spots") * per_dev
            f = jnp.where(f >= 0, f + offset, -1)
            return (
                count[None], f[None], y[None], x[None], ng[None]
            )

        counts, f, y, x, ng = jax.jit(_shard_identify)(frames_dev)
        counts = np.asarray(counts)
        if counts.max(initial=0) <= size:
            break
        size = 1 << (int(counts.max()) - 1).bit_length()

    out_f, out_y, out_x, out_ng = [], [], [], []
    f, y, x, ng = map(np.asarray, (f, y, x, ng))
    for d in range(n_dev):
        n = int(counts[d])
        if n == 0:
            continue
        out_f.append(f[d, :n].astype(np.int64))
        out_y.append(y[d, :n].astype(np.int64))
        out_x.append(x[d, :n].astype(np.int64))
        out_ng.append(ng[d, :n].astype(np.float32))
    if not out_f:
        empty = np.zeros(0, np.int64)
        return empty, empty, empty, np.zeros(0, np.float32)
    f = np.concatenate(out_f)
    keep = f < n_frames  # drop hits from padding (none expected)
    return (
        f[keep],
        np.concatenate(out_y)[keep],
        np.concatenate(out_x)[keep],
        np.concatenate(out_ng)[keep],
    )
