"""picasso_tpu.ops.gmm — batched constrained Gaussian-mixture EM.

The reference fits one GMM per cluster and farms clusters to a
ProcessPool (picasso/g5m.py:2365 _run_g5m_parallel, numba EM kernels
:68-320). The TPU design fits *all* clusters of a size bucket
simultaneously: points are padded to (G, P, D) with validity masks and
every EM quantity carries a leading cluster axis, so the E/M steps are
single fused XLA programs. Per-cluster early convergence is a freeze
mask inside one bounded ``lax.while_loop``; the multi-init loop and
the BIC growth over K stay as tiny host loops around the batched fit.

Semantics mirror picasso_tpu.g5m's (and the reference's) serial EM:
kmeans++ seeding with squared-distance sampling, hard-assignment
init, sigma bounds from the resp-weighted local localization
precision, component validity at >= min_locs assigned points, the
Sparrow-limit resolution check between component pairs, and strict
best-BIC selection. Randomness uses jax.random, so fits agree with
the serial path statistically (exactly on well-separated clusters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SPARROW_T = 40  # line samples per component pair (g5m.py:631)
_MAX_ITER = 100
_CONV_TOL = 1e-3


def _log_gaussian(X, means, prec, isotropic):
    """Log N(x | mu, cov) -> (G, P, K).

    X: (G, P, D); means: (G, K, D); prec = 1/sigma:
    (G, K) isotropic or (G, K, D) diagonal.
    """
    D = X.shape[-1]
    diff = X[:, :, None, :] - means[:, None, :, :]  # (G, P, K, D)
    if isotropic:
        quad = jnp.sum(diff * diff, -1) * (prec**2)[:, None, :]
        log_det = D * jnp.log(prec)[:, None, :]
    else:
        quad = jnp.sum(
            (diff * prec[:, None, :, :]) ** 2, -1
        )
        log_det = jnp.sum(jnp.log(prec), -1)[:, None, :]
    return -0.5 * (D * jnp.log(2 * jnp.pi) + quad) + log_det


def _logsumexp(a, axis):
    m = jnp.max(a, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.log(
        jnp.sum(jnp.exp(a - m), axis=axis)
    ) + jnp.squeeze(m, axis)


def _e_step(X, mask, weights, means, prec, isotropic):
    wlp = _log_gaussian(X, means, prec, isotropic) + jnp.log(
        weights
    )[:, None, :]
    log_norm = _logsumexp(wlp, axis=2)  # (G, P)
    n_valid = jnp.maximum(jnp.sum(mask, 1), 1)
    lb = jnp.sum(jnp.where(mask, log_norm, 0.0), 1) / n_valid
    log_resp = wlp - log_norm[:, :, None]
    return lb, log_resp


def _m_step(
    X, mask, log_resp, lp, sigma_bounds, loc_local, isotropic
):
    """Batched M step with SMLM sigma clipping (g5m.py:772).

    lp: (G, P) mean precision (isotropic) or (G, P, D) per axis.
    """
    resp = jnp.exp(log_resp) * mask[:, :, None]  # (G, P, K)
    nk = jnp.sum(resp, 1) + 1e-10  # (G, K)
    means = jnp.einsum("gpk,gpd->gkd", resp, X) / nk[:, :, None]
    diff = X[:, :, None, :] - means[:, None, :, :]
    D = X.shape[-1]
    lo, hi = sigma_bounds
    if isotropic:
        var = (
            jnp.einsum("gpk,gpk->gk", resp, jnp.sum(diff**2, -1))
            / nk / D
        )
        if loc_local:
            mean_lp = jnp.einsum("gpk,gp->gk", resp, lp) / nk
            min_v = lo**2 * mean_lp**2
            max_v = hi**2 * mean_lp**2
        else:
            min_v = jnp.full_like(var, lo**2)
            max_v = jnp.full_like(var, hi**2)
        cov = jnp.clip(var, min_v, max_v)
    else:
        cov_d = (
            jnp.einsum("gpk,gpkd->gkd", resp, diff**2)
            / nk[:, :, None]
        )
        if loc_local:
            mean_lp = (
                jnp.einsum("gpk,gpd->gkd", resp, lp)
                / nk[:, :, None]
            )
            min_v = lo**2 * mean_lp**2
            max_v = hi**2 * mean_lp**2
        else:
            min_v = jnp.full_like(cov_d, lo**2)
            max_v = jnp.full_like(cov_d, hi**2)
        cov = jnp.clip(cov_d, min_v, max_v)
    prec = 1.0 / jnp.sqrt(cov)
    weights = nk / jnp.sum(nk, 1, keepdims=True)
    return weights, means, cov, prec


def _kmeanspp(key, X, mask, K):
    """Batched kmeans++ seeding -> centers (G, K, D)."""
    G, P, D = X.shape
    k0, key = jax.random.split(key)
    ulogits = jnp.where(mask, 0.0, -jnp.inf)
    idx0 = jax.random.categorical(k0, ulogits)  # (G,)
    c0 = jnp.take_along_axis(
        X, idx0[:, None, None].astype(jnp.int32), axis=1
    )  # (G, 1, D)
    centers0 = jnp.zeros((G, K, D), X.dtype)
    centers0 = jax.lax.dynamic_update_slice(
        centers0, c0, (0, 0, 0)
    )
    d2_0 = jnp.sum((X - c0) ** 2, -1)  # (G, P)

    def body(k, carry):
        centers, d2, key = carry
        kk, key = jax.random.split(key)
        d2m = jnp.where(mask, d2, 0.0)
        total = jnp.sum(d2m, 1, keepdims=True)
        logits = jnp.where(
            total > 0,
            jnp.where(mask, jnp.log(d2m + 1e-30), -jnp.inf),
            ulogits,
        )
        idx = jax.random.categorical(kk, logits)
        ck = jnp.take_along_axis(
            X, idx[:, None, None].astype(jnp.int32), axis=1
        )
        centers = jax.lax.dynamic_update_slice(
            centers, ck, (0, k, 0)
        )
        d2 = jnp.minimum(d2, jnp.sum((X - ck) ** 2, -1))
        return centers, d2, key

    centers, _, _ = jax.lax.fori_loop(
        1, K, body, (centers0, d2_0, key)
    )
    return centers


def _sparrow_ok(means, weights, prec, valid, isotropic):
    """Batched Sparrow-limit check (g5m.py:631): every valid
    component pair must have a strict local minimum of the 2-component
    mixture PDF along the connecting line. -> (G,) bool."""
    G, K, D = means.shape
    t = jnp.linspace(0.0, 1.0, _SPARROW_T)
    # line points between all pairs: (G, K, K, T, D)
    mi = means[:, :, None, None, :]
    mj = means[:, None, :, None, :]
    line = mi + (mj - mi) * t[None, None, None, :, None]
    # log N(line | comp i) and | comp j)
    di = line - mi  # distance from component i
    dj = line - mj
    if isotropic:
        pi = prec[:, :, None, None]  # (G, K, 1, 1)
        pj = prec[:, None, :, None]
        qi = jnp.sum(di * di, -1) * pi**2
        qj = jnp.sum(dj * dj, -1) * pj**2
        ldi = D * jnp.log(pi)
        ldj = D * jnp.log(pj)
    else:
        pi = prec[:, :, None, None, :]
        pj = prec[:, None, :, None, :]
        qi = jnp.sum((di * pi) ** 2, -1)
        qj = jnp.sum((dj * pj) ** 2, -1)
        ldi = jnp.sum(jnp.log(prec), -1)[:, :, None, None]
        ldj = jnp.sum(jnp.log(prec), -1)[:, None, :, None]
    c = -0.5 * D * jnp.log(2 * jnp.pi)
    li = c + ldi - 0.5 * qi + jnp.log(weights)[:, :, None, None]
    lj = c + ldj - 0.5 * qj + jnp.log(weights)[:, None, :, None]
    pdf = jnp.exp(li) + jnp.exp(lj)  # (G, K, K, T)
    interior = pdf[..., 1:-1]
    has_min = jnp.any(
        (interior < pdf[..., :-2]) & (interior < pdf[..., 2:]),
        axis=-1,
    )
    pair_needed = (
        valid[:, :, None]
        & valid[:, None, :]
        & (
            jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 2)
        )
    )
    ok = jnp.all(~pair_needed | has_min, axis=(1, 2))
    # reference returns False when no component is valid
    return ok & (jnp.sum(valid, 1) > 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "isotropic", "loc_local", "n_init", "min_locs"
    ),
)
def fit_g5m_batched(
    X, mask, lp, key, *, K, sigma_bounds, isotropic, loc_local,
    n_init, min_locs,
):
    """Fit a K-component constrained GMM to every padded cluster.

    X: (G, P, D) f32; mask: (G, P) bool; lp: (G, P) isotropic or
    (G, P, D) diagonal localization precisions; n_init independent
    kmeans++ starts per cluster, best kept by lower bound among starts
    passing the Sparrow check (g5m.py:482 + 2127).

    Returns (weights, means, cov, prec, lower_bound, converged,
    valid, ok): leading axis G throughout; ``ok`` marks clusters where
    at least one init passed.
    """
    G, P, D = X.shape
    n_pts = jnp.sum(mask, 1)  # (G,)
    sigma_bounds = (
        jnp.asarray(sigma_bounds[0], X.dtype),
        jnp.asarray(sigma_bounds[1], X.dtype),
    )

    def one_init(key):
        centers = _kmeanspp(key, X, mask, K)
        d2 = jnp.sum(
            (X[:, :, None, :] - centers[:, None, :, :]) ** 2, -1
        )
        assign = jnp.argmin(d2, axis=2)  # (G, P)
        one_hot = jax.nn.one_hot(assign, K, dtype=X.dtype)
        log_resp0 = jnp.log(one_hot + 1e-300)
        params = _m_step(
            X, mask, log_resp0, lp, sigma_bounds, loc_local,
            isotropic,
        )

        def cond(c):
            _, _, conv, it = c
            return (it < _MAX_ITER) & ~jnp.all(conv)

        def step(c):
            params, prev_lb, conv, it = c
            w, m, cv, pc = params
            lb, log_resp = _e_step(
                X, mask, w, m, pc, isotropic
            )
            new = _m_step(
                X, mask, log_resp, lp, sigma_bounds, loc_local,
                isotropic,
            )
            # freeze clusters that converged on a previous step
            params = tuple(
                jnp.where(
                    conv.reshape((G,) + (1,) * (o.ndim - 1)),
                    o, n,
                )
                for o, n in zip(params, new)
            )
            new_conv = jnp.abs(lb - prev_lb) < _CONV_TOL
            prev_lb = jnp.where(conv, prev_lb, lb)
            conv = conv | new_conv
            return params, prev_lb, conv, it + 1

        lb0 = jnp.full((G,), -jnp.inf, X.dtype)
        conv0 = jnp.zeros((G,), bool)
        params, lb, conv, _ = jax.lax.while_loop(
            cond, step, (params, lb0, conv0, 0)
        )
        w, m, cv, pc = params
        n_assigned = jnp.round(w * n_pts[:, None]).astype(
            jnp.int32
        )
        valid = n_assigned >= min_locs
        ok = _sparrow_ok(m, w, pc, valid, isotropic)
        return w, m, cv, pc, lb, conv, valid, ok

    best = None
    best_lb = jnp.full((G,), -jnp.inf)
    any_ok = jnp.zeros((G,), bool)
    for i in range(n_init):
        key, sub = jax.random.split(key)
        w, m, cv, pc, lb, conv, valid, ok = one_init(sub)
        better = ok & (lb > best_lb)
        if best is None:
            best = (w, m, cv, pc, lb, conv, valid)
            best_lb = jnp.where(better, lb, -jnp.inf)
        else:
            best = tuple(
                jnp.where(
                    better.reshape((G,) + (1,) * (o.ndim - 1)),
                    n, o,
                )
                for o, n in zip(
                    best, (w, m, cv, pc, lb, conv, valid)
                )
            )
            best_lb = jnp.where(better, lb, best_lb)
        any_ok = any_ok | ok
    w, m, cv, pc, lb, conv, valid = best
    return w, m, cv, pc, lb, conv, valid, any_ok


@functools.partial(
    jax.jit, static_argnames=("isotropic",)
)
def bic_batched(X, mask, weights, means, prec, valid, isotropic):
    """Per-cluster BIC over VALID components with renormalized
    weights (g5m.py:455 via G5M.bic): (G,)."""
    wv = jnp.where(valid, weights, 0.0)
    wv = wv / jnp.maximum(jnp.sum(wv, 1, keepdims=True), 1e-30)
    logg = _log_gaussian(X, means, prec, isotropic)
    wlp = logg + jnp.where(
        valid, jnp.log(wv + 1e-300), -jnp.inf
    )[:, None, :]
    score = _logsumexp(wlp, axis=2)
    n = jnp.maximum(jnp.sum(mask, 1), 1).astype(X.dtype)
    mean_score = jnp.sum(jnp.where(mask, score, 0.0), 1) / n
    Kv = jnp.sum(valid, 1).astype(X.dtype)
    D = X.shape[-1]
    if isotropic:
        n_params = Kv * D + Kv + Kv - 1
    else:
        n_params = Kv * D * 2 + Kv - 1
    return n_params * jnp.log(n) - 2 * mean_score * n


def pad_clusters(Xs, lps, bucket: int):
    """Stack variable-size clusters into (G, bucket, ...) + mask."""
    G = len(Xs)
    D = Xs[0].shape[1]
    X = np.zeros((G, bucket, D), np.float32)
    mask = np.zeros((G, bucket), bool)
    lp0 = np.asarray(lps[0])
    lp_shape = (
        (G, bucket) if lp0.ndim == 1 else (G, bucket, D)
    )
    lp = np.ones(lp_shape, np.float32)
    for g, (x, l) in enumerate(zip(Xs, lps)):
        n = len(x)
        X[g, :n] = x
        mask[g, :n] = True
        lp[g, :n] = l
    return X, mask, lp
