"""Ray-axis sharding of the training step.

Strategy (SURVEY §2.2-2.3, §7.1): params replicated, ray batch sharded on
the 'dp' mesh axis. The sampled rays get a with_sharding_constraint right
after generation, so XLA partitions every downstream per-ray computation
(the SDF/color MLP sweeps — all the FLOPs) across devices and inserts a
psum for the scalar loss/gradients, overlapped with backward compute by
the latency-hiding scheduler. No shard_map needed: the constraint plus
jit's sharding propagation is the whole story.

The mesh is threaded explicitly through ``TrainerConfig.mesh`` — there is
no module-global sharding state to install or clean up.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from color_neus_tpu.parallel.mesh import RAY_AXIS, replicated


def constrain_rays(x, mesh: Mesh | None):
    """Constrain a [n_rays, ...] array to be sharded on the ray axis of
    `mesh`; identity when mesh is None (single device)."""
    if mesh is None or x is None:
        return x
    spec = P(RAY_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def with_mesh(cfg, mesh: Mesh | None):
    """A copy of a TrainerConfig with its sharding mesh set."""
    return dataclasses.replace(cfg, mesh=mesh)


def make_sharded_train_step(cfg, mesh: Mesh, donate: bool = True):
    """Jitted train step with params replicated and rays sharded.

    cfg.n_rays must be divisible by the mesh size.
    """
    from color_neus_tpu.models import trainer as TR

    if cfg.n_rays % mesh.devices.size != 0:
        raise ValueError(
            f"n_rays={cfg.n_rays} not divisible by {mesh.devices.size} devices")

    rep = replicated(mesh)
    cfg = with_mesh(cfg, mesh)

    def step(state, scene, images, masks, img_ids, key):
        return TR.train_step(state, scene, cfg, images, masks, img_ids, key)

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
