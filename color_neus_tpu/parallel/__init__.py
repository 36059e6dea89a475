"""Parallelism layer: device mesh + ray sharding.

The reference has no distributed support at all (train.py:111 asserts a
single GPU; SURVEY §2.2). Here parallelism is a first-class design:
params (~1.4M) are replicated, the ray batch is sharded over a 1-D
('dp') jax.sharding.Mesh — within a slice the gradient psum rides ICI,
across hosts DCN — and XLA inserts/overlaps the collectives.
"""

from color_neus_tpu.parallel.mesh import make_mesh, replicated, ray_sharded
from color_neus_tpu.parallel.sharding import (
    constrain_rays, with_mesh, make_sharded_train_step,
)
