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

# Keep lightweight at import: submodules are imported lazily by users
# (e.g. `from picasso_tpu import io, localize`).
