"""Where does 512^3 grid-eval time go? (VERDICT r4 #4 diagnosis.)

Separates, for the mesh-extraction SDF sweep at EP_RES^3:
  * device_only_s: all eval_super dispatches issued back-to-back with NO
    result fetch (block on the last one) — kernel + launch cost,
  * fetch_s: the full evaluate_sdf_grid wall time minus device_only_s —
    the D2H tunnel share,
and repeats per extract_precision arm (f32 / f32x3 / bf16) and for a
tile-size ladder, printing ONE JSON line.

    python tools/extract_probe.py            # EP_RES=256 default
    EP_RES=512 python tools/extract_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops import mesh as M
    from color_neus_tpu.ops.pallas.sdf_mlp import make_fused_sdf_fn

    res = int(os.environ.get("EP_RES", 256))
    reps = int(os.environ.get("EP_REPS", 2))
    rcfg = RendererConfig(
        kind="color_neus",
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    params = neus.init_renderer(jax.random.PRNGKey(3), rcfg)
    bmin = np.full(3, -1.01, np.float32)
    bmax = np.full(3, 1.01, np.float32)
    n = res ** 3

    rep = {"what": "grid-eval time split: device kernels vs D2H fetch",
           "platform": jax.devices()[0].platform, "res": res, "arms": {}}

    chunk = 1 << 18
    for prec in ("f32", "f32x3", "bf16"):
        for tile in (1024, 2048):
            base = make_fused_sdf_fn(params["sdf"], rcfg.sdf, tile=tile,
                                     prec=prec)
            fn = lambda p: -base(p)

            K = min(4, (n + chunk - 1) // chunk)
            stride = K * chunk
            n_pad = (n + stride - 1) // stride * stride
            axes = [jnp.asarray(np.linspace(bmin[i], bmax[i], res,
                                            dtype=np.float32))
                    for i in range(3)]

            @jax.jit
            def eval_super(start):
                flat = start + jnp.arange(stride)
                flat = jnp.minimum(flat, n - 1)
                px = axes[0][flat // (res * res)]
                py = axes[1][(flat // res) % res]
                pz = axes[2][flat % res]
                p = jnp.stack([px, py, pz], axis=-1).reshape(K, chunk, 3)
                return jax.lax.map(fn, p)

            eval_super(jnp.asarray(0, jnp.int32)).block_until_ready()  # compile

            dev = []
            for _ in range(reps):
                t0 = time.perf_counter()
                outs = [eval_super(jnp.asarray(i, jnp.int32))
                        for i in range(0, n_pad, stride)]
                outs[-1].block_until_ready()
                dev.append(time.perf_counter() - t0)
                del outs

            full = []
            for _ in range(reps):
                t0 = time.perf_counter()
                M.evaluate_sdf_grid(params, rcfg, bmin, bmax, res,
                                    sdf_chunk_fn=fn)
                full.append(time.perf_counter() - t0)

            d, f = min(dev), min(full)
            rep["arms"][f"{prec}_t{tile}"] = {
                "device_only_s": round(d, 2), "full_s": round(f, 2),
                "fetch_share_s": round(f - d, 2),
                "dispatches": n_pad // stride,
            }
            print(f"# {prec} tile={tile}: device {d:.2f}s full {f:.2f}s",
                  file=sys.stderr, flush=True)

    print(json.dumps(rep))


if __name__ == "__main__":
    main()
