"""color_neus_tpu — a TPU-native neural implicit surface framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
Color-NeuS reference (Colmar-zlicheng/Color-NeuS): SDF-based volume
rendering (NeuS), relocated view-independent color with a view-dependent
relight residual (Color-NeuS), learnable camera refinement, four dataset
families, training/eval runtime, and mesh extraction with vertex colors.

Design stance (TPU-first, not a port):
  * pure-functional core: params are pytrees; the train step is a single
    jitted (state, batch, key) -> (state, metrics) function
  * static shapes everywhere; hierarchical up-sampling unrolled with
    fixed sample counts so XLA can tile MLP GEMMs onto the MXU
  * SDF input-gradients via jax.vjp (differentiable, second-order safe)
  * rays sharded over a jax.sharding.Mesh; params replicated; gradient
    psum inserted by XLA (see color_neus_tpu.parallel)
  * Pallas kernels for the no-grad SDF sweeps (up-sampling, grid eval)
    where the whole 1.4M-param model fits in VMEM
"""

__version__ = "0.1.0"
