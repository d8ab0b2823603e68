"""picasso_tpu.ops — the TPU compute core.

Pure-functional JAX programs (jit/vmap over static shapes) and Pallas
TPU kernels replacing the reference's numba nopython loops, thread/
process pools and the CUDA Gpufit DLL.
"""
