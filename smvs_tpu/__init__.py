"""smvs_tpu — TPU-native shading-aware multi-view stereo.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
flanggut/smvs (Langguth et al., "Shading-aware Multi-view Stereo",
ECCV 2016), designed TPU-first:

- dense, statically-shaped masked arrays instead of pointer-based sparse
  surfaces (reference: lib/surface.h),
- batched per-patch Gauss-Newton assembly through `jax.jacfwd` and MXU
  einsums instead of hand-derived scalar Jacobian loops
  (reference: lib/gauss_newton_step.cc, lib/correspondence.cc),
- 9-point-stencil block Hessians + matrix-free PCG instead of CSR block
  sparse matrices (reference: lib/block_sparse_matrix.h),
- `lax.scan` / Pallas semi-global matching instead of SSE scalar scans
  (reference: lib/sgm_stereo.cc),
- view-batch + patch-block sharding over `jax.sharding.Mesh` instead of a
  thread pool (reference: lib/thread_pool.h).
"""

__version__ = "0.1.0"
