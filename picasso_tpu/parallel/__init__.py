"""picasso_tpu.parallel — multi-chip scaling via jax.sharding.

The reference scales with thread/process pools on one host
(SURVEY.md §2.3); here the same workloads shard over a TPU device mesh:
spot batches are data-parallel across chips (no collectives needed for
the fit itself), and reductions (render histograms, drift correlation
sums) ride ICI via psum.
"""

from picasso_tpu.parallel.mesh import (  # noqa: F401
    default_mesh,
    fit_mle_sharded,
    render_hist_sharded,
    sharded_pipeline_step,
)
