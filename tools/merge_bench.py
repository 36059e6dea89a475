"""A/B the two sorted-merge formulations of the XLA hierarchy on chip.

merge_z_vals (counting-rank + equality-masked reduce, O(R*n*(n+m)) VPU)
vs merge_z_vals_sort (one stable lax.sort, O(R*S log^2 S) bitonic).
Also times one full hierarchical_z_vals with each, at the bench shape.

    python tools/merge_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from color_neus_tpu.models import neus

    R, n, m = 2048, 448, 64  # the last (most expensive) merge round
    k = jax.random.PRNGKey(0)
    z = jnp.sort(jax.random.uniform(k, (R, n)), axis=1)
    zn = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (R, m)), axis=1)
    s = jax.random.normal(jax.random.PRNGKey(2), (R, n))
    sn = jax.random.normal(jax.random.PRNGKey(3), (R, m))

    # k merges per dispatch to beat the ~30 ms tunnel latency
    K = 8

    def many(fn):
        def f(z, zn, s, sn):
            acc = 0.0
            for i in range(K):
                zz, ss = fn(z + acc * 1e-30, zn, s, sn)
                acc = acc + zz[0, 0] + ss[0, 0]
            return acc
        return jax.jit(f)

    res = {}
    t1 = timeit(many(neus.merge_z_vals), z, zn, s, sn)
    res["counting_ms_per_merge"] = round(t1 / K, 3)
    t2 = timeit(many(neus.merge_z_vals_sort), z, zn, s, sn)
    res["sort_ms_per_merge"] = round(t2 / K, 3)

    # equality check — EXACT: the docstring claim in models/neus.py is
    # "bit-identical", so assert bitwise equality, not allclose
    a = neus.merge_z_vals(z, zn, s, sn)
    b = neus.merge_z_vals_sort(z, zn, s, sn)
    res["z_equal"] = bool(jnp.all(a[0] == b[0]))
    res["sdf_equal"] = bool(jnp.all(a[1] == b[1]))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
