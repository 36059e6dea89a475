"""Pallas TPU kernels.

Round-1 kernel set:
  * sdf_mlp: fully-fused SDF MLP forward (all ~1.4M params VMEM-resident,
    points streamed in tiles) for the no-grad paths — the 5 hierarchical
    up-sample sweeps per train step and dense-grid mesh extraction.

The differentiable render core stays in XLA (autodiff through the
second-order eikonal path); kernels cover the paths where no VJP is
needed, with the plain-XLA implementation kept as the always-available
oracle (and used automatically off-TPU).
"""

from color_neus_tpu.ops.pallas.sdf_mlp import (
    pack_sdf_weights, fused_sdf_fn, make_fused_sdf_fn, fused_kernel_available,
    resolve_sdf_fn,
)
