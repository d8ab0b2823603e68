"""picasso_tpu — a TPU-native framework for single-molecule localization
microscopy (DNA-PAINT / SMLM).

Re-implements the full capability surface of the reference `picasso`
suite (spot identification, batched Gaussian PSF fitting with MLE/LQ,
drift correction, rendering, clustering, simulation, SPINNA/G5M
workflows) on top of JAX/XLA with Pallas TPU kernels for the hot compute
paths, instead of numba thread pools and a CUDA Gpufit DLL.

The on-disk data contract (HDF5 ``locs`` recarray + YAML info chain,
drift txt, picks yaml) is byte-compatible with the reference so existing
downstream tooling keeps working.
"""

__version__ = "0.1.0"


def _configure_jax_defaults():
    """Framework defaults for JAX: a persistent XLA compilation cache
    (first compiles of the fit kernels take tens of seconds; cached
    compiles are instant across processes). Applied once on import;
    user-set configuration wins."""
    import os

    try:
        import jax
    except Exception:  # pragma: no cover - jax always present on TPU
        return
    # Some TPU runtime plugins register themselves regardless of
    # JAX_PLATFORMS; honor both it and PICASSO_FORCE_CPU=1 by pinning
    # the platform before the first backend query.
    if (
        os.environ.get("PICASSO_FORCE_CPU") == "1"
        or os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
    ):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    if (
        jax.config.jax_compilation_cache_dir is None
        and "JAX_COMPILATION_CACHE_DIR" not in os.environ
    ):
        # key the cache by a host fingerprint: XLA:CPU AOT results are
        # machine-code and can SIGILL if reused on a host with
        # different vector extensions (shared home dirs across
        # fleets). Flags alone are too weak — XLA derives extra
        # tuning pseudo-features (prefer-no-gather/scatter) from the
        # CPU MODEL, and blobs from another jaxlib don't reload — so
        # model name and jaxlib version join the hash.
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                keep = [
                    line for line in f
                    if line.startswith(("flags", "model name"))
                ][:2]
            import jaxlib

            keep.append(getattr(jaxlib, "__version__", "?"))
            fingerprint = hashlib.sha1(
                "".join(keep).encode()
            ).hexdigest()[:8]
        except Exception:
            fingerprint = "generic"
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".picasso_tpu",
            f"jax_cache_{fingerprint}",
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:
            pass


_configure_jax_defaults()

# Keep lightweight at import: submodules are imported lazily by users
# (e.g. `from picasso_tpu import io, localize`).
