"""On-TPU check of the fused hierarchy kernel at flagship shape.

Compares fused_hierarchy_z (compiled) vs hierarchical_z_vals (XLA path)
on identical inputs, and times both. Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.models.configs import RendererConfig, ColorConfig
from color_neus_tpu.models import neus
from color_neus_tpu.ops.pallas.hierarchy import fused_hierarchy_z
from color_neus_tpu.ops.pallas.sdf_mlp import resolve_sdf_sweep_fn
from color_neus_tpu.ops.rays import near_far_from_sphere


def main():
    print("platform:", jax.devices()[0].platform)
    rcfg = RendererConfig(
        kind="color_neus", n_samples=256, n_importance=256,
        up_sample_steps=4,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    key = jax.random.PRNGKey(0)
    params = neus.init_renderer(key, rcfg)
    R = 2048
    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    ro = -2.5 * rd + 0.3 * jax.random.normal(k1, (R, 3))
    near, far = near_far_from_sphere(ro, rd)

    sweep = resolve_sdf_sweep_fn(params["sdf"], rcfg.sdf, "on")
    xla_fn = jax.jit(lambda ro, rd, near, far: neus.hierarchical_z_vals(
        params, rcfg, ro, rd, near, far, key=None, perturb_overwrite=0.0,
        sdf_rays_fn=sweep))
    fused_fn = jax.jit(lambda ro, rd, near, far: fused_hierarchy_z(
        params["sdf"], rcfg, ro, rd, near, far, t_rand=None))

    t0 = time.time()
    z_ref = np.asarray(xla_fn(ro, rd, near, far))
    print(f"xla compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    z_got = np.asarray(fused_fn(ro, rd, near, far))
    print(f"fused compile+run: {time.time()-t0:.1f}s")

    err = np.abs(z_got - z_ref)
    print(f"max abs err: {err.max():.3e}  mean: {err.mean():.3e}")
    # timing: 10 iters each, host-fetch sync
    for name, fn in (("xla", xla_fn), ("fused", fused_fn)):
        _ = float(fn(ro, rd, near, far)[0, 0])
        t0 = time.time()
        n = 10
        for _ in range(n):
            out = fn(ro, rd, near, far)
        _ = float(out[0, 0])
        dt = (time.time() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms/call at R={R}")


if __name__ == "__main__":
    main()
