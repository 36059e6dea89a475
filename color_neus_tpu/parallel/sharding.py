"""Ray-axis sharding of the training step.

Strategy (SURVEY §2.2-2.3, §7.1): params replicated, ray batch sharded on
the 'dp' mesh axis. The sampled rays get a with_sharding_constraint right
after generation, so XLA partitions every downstream per-ray computation
(the SDF/color MLP sweeps — all the FLOPs) across devices and inserts a
psum for the scalar loss/gradients, overlapped with backward compute by
the latency-hiding scheduler. No shard_map needed: the constraint plus
jit's sharding propagation is the whole story.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from color_neus_tpu.parallel.mesh import RAY_AXIS, replicated


_ACTIVE_MESH: Mesh | None = None


def set_ray_sharding(mesh: Mesh | None):
    """Install (or clear) the mesh used by constrain_rays at trace time."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def constrain_rays(x):
    """Constrain a [n_rays, ...] array to be sharded on the ray axis."""
    if _ACTIVE_MESH is None or x is None:
        return x
    spec = P(RAY_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(_ACTIVE_MESH, spec))


def make_sharded_train_step(cfg, mesh: Mesh, donate: bool = True):
    """Jitted train step with params replicated and rays sharded.

    cfg.n_rays must be divisible by the mesh size.
    """
    from color_neus_tpu.models import trainer as TR

    if cfg.n_rays % mesh.devices.size != 0:
        raise ValueError(
            f"n_rays={cfg.n_rays} not divisible by {mesh.devices.size} devices")

    rep = replicated(mesh)

    def step(state, scene, images, masks, img_ids, key):
        return TR.train_step(state, scene, cfg, images, masks, img_ids, key)

    set_ray_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
