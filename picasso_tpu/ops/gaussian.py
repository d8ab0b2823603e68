"""Shared integrated-Gaussian PSF math (Smith et al., Nature Methods
2010 supplement), vectorized for batched evaluation on TPU.

Behavioral reference: picasso/gaussmle.py:268-383 (scalar numba
versions of the same equations). All functions here operate on arrays
of pixel offsets ``d = x_k - mu`` of any shape, broadcasting over a
batch of spots; downstream kernels combine the per-axis factors with
outer products instead of looping over pixels.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT_2PI = 2.5066282746310002
_INV_SQRT2 = 0.70710678118654757


def erf(x: jnp.ndarray) -> jnp.ndarray:
    """Branchless rational erf (Abramowitz & Stegun 7.1.26, |error|
    <= 1.5e-7 — below float32 rounding for this model). Implemented
    from mul/exp only because the Mosaic (Pallas TPU) lowering has no
    erf primitive; used on every backend so the XLA and Pallas fit
    paths stay bit-identical."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def integrated_gaussian(d: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Integral of a unit Gaussian over one pixel (deltaE, eq. 4a/b):
    0.5 * (erf((d+.5)/(sqrt(2) sigma)) - erf((d-.5)/(sqrt(2) sigma))),
    evaluated tail-stably via the complement form (see _psf_from_exp).
    (picasso/gaussmle.py:269)"""
    inv_s = 1.0 / sigma
    ap = (d + 0.5) * inv_s
    am = (d - 0.5) * inv_s
    ea = jnp.exp(-0.5 * ap * ap)
    eb = jnp.exp(-0.5 * am * am)
    return _psf_from_exp(ap, am, ea, eb)


def derivative_integrated_gaussian(
    d: jnp.ndarray, sigma: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis factors of d(deltaE)/dmu and d2(deltaE)/dmu2
    (eq. 11a/14a; picasso/gaussmle.py:283). The caller multiplies by
    ``photons * PSF_orth``."""
    a = jnp.exp(-0.5 * ((d + 0.5) / sigma) ** 2)
    b = jnp.exp(-0.5 * ((d - 0.5) / sigma) ** 2)
    first = (b - a) / (_SQRT_2PI * sigma)
    second = ((d - 0.5) * b - (d + 0.5) * a) / (_SQRT_2PI * sigma**3)
    return first, second


def G(n: int, m: int, d: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Helper for sigma derivatives in the anisotropic case (eq. 20a;
    picasso/gaussmle.py:307):
    (a_-^m e^{-a_-²/2σ²} - a_+^m e^{-a_+²/2σ²}) / (σ^n sqrt(2π))."""
    a_minus = d - 0.5
    a_plus = d + 0.5
    exp_minus = jnp.exp(-(a_minus**2) / (2 * sigma**2))
    exp_plus = jnp.exp(-(a_plus**2) / (2 * sigma**2))
    return (a_minus**m * exp_minus - a_plus**m * exp_plus) / (
        sigma**n * _SQRT_2PI
    )


def derivative_integrated_gaussian_sigma(
    d: jnp.ndarray, sigma: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis factors of d(deltaE)/dsigma and d2/dsigma2 in the
    anisotropic case (eq. 21a/b; picasso/gaussmle.py:320). The caller
    multiplies by ``photons * PSF_orth``."""
    first = G(2, 1, d, sigma)
    second = G(5, 3, d, sigma) - 2 * G(3, 1, d, sigma)
    return first, second


def iso_sigma_axis_terms(
    d: jnp.ndarray, sigma: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis d(deltaE)/dsigma and d2/dsigma2 for the isotropic-sigma
    model (picasso/gaussmle.py:340). Returns (dPSF/dsigma,
    d2PSF/dsigma2) per axis; the caller combines the two axes."""
    a_plus = (d + 0.5) / (jnp.sqrt(2.0) * sigma)
    a_minus = (d - 0.5) / (jnp.sqrt(2.0) * sigma)
    F = a_minus * jnp.exp(-(a_minus**2)) - a_plus * jnp.exp(-(a_plus**2))
    dPSF = F / (jnp.sqrt(jnp.pi) * sigma)
    dF = (
        a_plus * jnp.exp(-(a_plus**2)) * (1 - 2 * a_plus**2)
        - a_minus * jnp.exp(-(a_minus**2)) * (1 - 2 * a_minus**2)
    ) / sigma
    d2PSF = (1 / jnp.sqrt(jnp.pi)) * ((-F / sigma**2) + dF / sigma)
    return dPSF, d2PSF


def _erfc_from_exp(a, e):
    """erfc(|a|/sqrt(2)) given e == exp(-(a/sqrt(2))^2) — reuses the
    exponential already computed for the derivative factors. The
    complement form carries the exp factor explicitly, so it keeps
    RELATIVE accuracy deep in the tail where 1 - erfc rounds to 1."""
    x = jnp.abs(a) * _INV_SQRT2
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return poly * e


def _psf_from_exp(ap, am, ea, eb):
    """0.5*(erf(ap/sqrt2) - erf(am/sqrt2)) evaluated tail-stably.

    The naive difference of erf values computed as sign*(1 - erfc)
    collapses in float32 once erfc < 2^-24: both operands round to
    ±1 and the pixel's PSF value cancels to 0. That loses the dim
    pixels of bright spots — at photons ~1e6 over bg ~0.01 the CRLB's
    1/model weights were off by ~6% (the bg row worst). Rewriting the
    difference per sign region keeps only complement terms:

      both >= 0:  0.5*(erfc(am) - erfc(ap))     (right tail)
      both <= 0:  0.5*(erfc(-ap) - erfc(-am))   (left tail)
      straddling: 0.5*(2 - erfc(ap) - erfc(-am))

    Exactly equal in real arithmetic; float32-relative-accurate in
    the tails. Mosaic-safe (selects + the shared exponentials)."""
    qa = _erfc_from_exp(ap, ea)
    qb = _erfc_from_exp(am, eb)
    return _psf_from_erfc(ap, am, qa, qb)


def _psf_from_erfc(ap, am, qa, qb):
    """Sign-region assembly of the tail-stable PSF from precomputed
    complements (see _psf_from_exp)."""
    return jnp.where(
        am >= 0,
        0.5 * (qb - qa),
        jnp.where(ap <= 0, 0.5 * (qa - qb), 0.5 * (2.0 - qa - qb)),
    )


def _shared_exp_erfc(d, inv_s):
    """Per-axis exponentials and erfc complements over the EXTENDED
    half-offset grid, exploiting that consecutive grid rows share
    them: with d[i] = i - x0 (a consecutive-integer grid along axis
    0, true for every fit caller), exp(-(d[i]+0.5)²/2σ²) ==
    exp(-(d[i+1]-0.5)²/2σ²) — so the S+1 distinct values replace the
    2·S the naive ea/eb evaluation pays. exp and the erfc polynomial
    are the dominant VPU transcendental cost per Newton iteration
    (docs/performance.md roofline); this cuts both by ~43% at S=7.

    Returns (ap, am, ea, eb, qa, qb): the usual (S, N) views into the
    (S+1, N) shared arrays (slices, no copies of the math)."""
    am8 = (d - 0.5) * inv_s  # (S, N): rows 0..S-1 of the grid
    top = (d[-1:] + 0.5) * inv_s  # row S
    a8 = jnp.concatenate([am8, top], axis=0)  # (S+1, N)
    e8 = jnp.exp(-0.5 * a8 * a8)
    q8 = _erfc_from_exp(a8, e8)
    ap = a8[1:]
    am = a8[:-1]
    ea = e8[1:]
    eb = e8[:-1]
    qa = q8[1:]
    qb = q8[:-1]
    return ap, am, ea, eb, qa, qb


def fused_axis_terms(
    d: jnp.ndarray, sigma: jnp.ndarray
) -> tuple[jnp.ndarray, ...]:
    """(psf, dmu, d2mu, dsig, d2sig) per-axis factors computed from two
    shared exponentials.

    CONTRACT: ``d``'s rows must be a consecutive-integer grid along
    axis 0 (d[i] = i - x0, as every fit kernel builds it) — the
    row-shared transcendentals (_shared_exp_erfc) are wrong for
    arbitrary offsets. Use the unfused helpers for free-form ``d``.

    integrated_gaussian's erf terms and every derivative share the same
    exp(-(d±0.5)²/2σ²) values; evaluating them once over the EXTENDED
    half-offset grid (consecutive rows share them — _shared_exp_erfc)
    cuts the transcendental count per Newton iteration from 6 exps to
    (S+1)/S ≈ 1.14 per axis row — the dominant VPU cost in the fit
    kernels. Identical math to the separate helpers
    (picasso/gaussmle.py:268-338), same A&S erf."""
    inv_s = 1.0 / sigma
    ap, am, ea, eb, qa, qb = _shared_exp_erfc(d, inv_s)

    psf = _psf_from_erfc(ap, am, qa, qb)
    norm = inv_s / _SQRT_2PI
    dmu = (eb - ea) * norm
    g1 = ((d - 0.5) * eb - (d + 0.5) * ea) * norm  # sigma * G(2,1)
    d2mu = g1 * inv_s * inv_s
    dsig = g1 * inv_s
    g3 = (
        (d - 0.5) ** 3 * eb - (d + 0.5) ** 3 * ea
    ) * norm  # sigma^4 * G(5,3)
    d2sig = (g3 * inv_s * inv_s - 2.0 * g1) * inv_s * inv_s
    return psf, dmu, d2mu, dsig, d2sig


def fused_axis_terms_iso(
    d: jnp.ndarray, sigma: jnp.ndarray
) -> tuple[jnp.ndarray, ...]:
    """(psf, dmu, d2mu, dPSF, d2PSF) for the isotropic-sigma model from
    the same two shared exponentials (cf. iso_sigma_axis_terms /
    picasso/gaussmle.py:339): with a± = (d±0.5)/(sqrt(2)σ),
    exp(-a±²) == exp(-(d±0.5)²/2σ²), so no extra transcendentals
    (shared across grid rows via _shared_exp_erfc)."""
    inv_s = 1.0 / sigma
    ap, am, ea, eb, qa, qb = _shared_exp_erfc(d, inv_s)

    psf = _psf_from_erfc(ap, am, qa, qb)
    norm = inv_s / _SQRT_2PI
    dmu = (eb - ea) * norm
    d2mu = ((d - 0.5) * eb - (d + 0.5) * ea) * norm * inv_s * inv_s

    sqrt_pi = 1.7724538509055159
    F = (am * eb - ap * ea) * _INV_SQRT2
    dPSF = F / (sqrt_pi * sigma)
    dF = (
        ap * ea * (1.0 - ap * ap) - am * eb * (1.0 - am * am)
    ) * _INV_SQRT2 * inv_s
    d2PSF = (1.0 / sqrt_pi) * (-F * inv_s * inv_s + dF * inv_s)
    return psf, dmu, d2mu, dPSF, d2PSF


def gaussian_pdf(d: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Plain (non-integrated) normalized Gaussian used by the LQ model
    (picasso/gausslq.py:33)."""
    norm = 0.3989422804014327 / sigma
    return norm * jnp.exp(-0.5 * (d / sigma) ** 2)
