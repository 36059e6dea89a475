"""Microbenchmark: where does the march kernel's MXU efficiency go?

Times a bare pallas kernel that mimics the march kernels' inner MLP:
a chain of L [T,256]x[256,256] bf16 dots with a per-layer activation,
at the march tile size. Variants isolate the activation cost:

    none      pure dot chain (practical MXU ceiling for this shape)
    relu      cheap VPU op
    softplus  the SDF activation (beta=100): exp + log1p per element
    sigmoid   the compositing / relight op

Prints ms per call and achieved TFLOP/s for each variant.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def act_none(x):
    return x


def act_relu(x):
    return jnp.maximum(x, 0.0)


def act_softplus(x):
    # fields.py softplus beta=100 form
    bx = x * 100.0
    return jnp.where(bx > 30.0, x, jnp.log1p(jnp.exp(bx)) * 0.01)


def act_sigmoid(x):
    return jax.nn.sigmoid(x)


def act_softplus_gate(x):
    # what the march kernels actually do per hidden layer: softplus
    # value AND sigmoid gate (two independent transcendental chains)
    bx = x * 100.0
    sp = jnp.where(bx > 30.0, x, jnp.log1p(jnp.exp(bx)) * 0.01)
    g = jax.nn.sigmoid(bx)
    # keep the gate alive without changing sp materially
    return sp + g * 1e-30


def act_shared_gate(x):
    # shared-exp form (point_pipeline._softplus100_and_gate)
    e = jnp.exp(-100.0 * jnp.abs(x))
    sp = jnp.maximum(x, 0.0) + jnp.log1p(e) * 0.01
    r = 1.0 / (1.0 + e)
    g = jnp.where(x >= 0.0, r, 1.0 - r)
    return sp + g * 1e-30


def act_expm1_gate(x):
    # gate from the VALUE via 1 - sigmoid(z) = exp(-softplus(z)):
    # g = -expm1(-100*sp) exactly — one extra transcendental, no
    # reciprocal, no selects beyond the sp chain's own
    e = jnp.exp(-100.0 * jnp.abs(x))
    sp = jnp.maximum(x, 0.0) + jnp.log1p(e) * 0.01
    g = 1.0 - jnp.exp(-100.0 * sp)
    return sp + g * 1e-30


def act_recip_approx_gate(x):
    # shared-exp with the divide replaced by the VPU's approximate
    # reciprocal (pl.reciprocal approx=True; ~2^-14 rel err)
    e = jnp.exp(-100.0 * jnp.abs(x))
    sp = jnp.maximum(x, 0.0) + jnp.log1p(e) * 0.01
    r = pl.reciprocal(1.0 + e, approx=True)
    g = jnp.where(x >= 0.0, r, 1.0 - r)
    return sp + g * 1e-30


def act_recip_newton_gate(x):
    # approximate reciprocal + one Newton step: full f32 precision,
    # no divide
    e = jnp.exp(-100.0 * jnp.abs(x))
    sp = jnp.maximum(x, 0.0) + jnp.log1p(e) * 0.01
    d = 1.0 + e
    r = pl.reciprocal(d, approx=True)
    r = r * (2.0 - d * r)
    g = jnp.where(x >= 0.0, r, 1.0 - r)
    return sp + g * 1e-30


def act_sp_only_gate_from_out(x):
    # the deferred form: this layer computes sp only; the PREVIOUS
    # layer's gate is derived from its kept output (as the grad chain
    # would, one layer later in the instruction stream)
    e = jnp.exp(-100.0 * jnp.abs(x))
    sp = jnp.maximum(x, 0.0) + jnp.log1p(e) * 0.01
    return sp


def chain_kernel_deferred(L, x_ref, w_ref, o_ref):
    # sp-only chain, gates reconstructed one layer later from the kept
    # sp outputs: measures whether splitting the two transcendental
    # chains across GEMM shadows restores MXU overlap
    x = x_ref[:]
    w = w_ref[:].astype(jnp.bfloat16)
    prev_sp = None
    acc = 0.0
    for _ in range(L):
        x = jnp.dot(x.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        if prev_sp is not None:
            acc = acc + (1.0 - jnp.exp(-100.0 * prev_sp)) * 1e-30
        x = act_sp_only_gate_from_out(x)
        prev_sp = x
    o_ref[:] = x + acc


def chain_kernel(L, act, bf16, x_ref, w_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:]
    if bf16:
        w = w.astype(jnp.bfloat16)
    for _ in range(L):
        xi = x.astype(jnp.bfloat16) if bf16 else x
        x = jnp.dot(xi, w, preferred_element_type=jnp.float32)
        x = act(x)
    o_ref[:] = x


def run(T, L, G, act, name, bf16=True):
    x = jax.random.normal(jax.random.PRNGKey(0), (G * T, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 256), jnp.float32)
    w = w * 0.06  # keep the chain finite
    fn = pl.pallas_call(
        partial(chain_kernel, L, act, bf16),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * T, 256), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jfn = jax.jit(lambda x: fn(x, w))
    r = jfn(x)
    _ = float(r[0, 0])
    t0 = time.time()
    n = 20
    for _ in range(n):
        r = jfn(x)
    _ = float(r[0, 0])
    dt = (time.time() - t0) / n
    fl = 2.0 * G * T * 256 * 256 * L
    print(f"{name:10s} T={T:5d} L={L} G={G}: {dt*1e3:7.2f} ms  "
          f"{fl/dt/1e12:6.1f} TFLOP/s")


def run_deferred(T, L, G):
    x = jax.random.normal(jax.random.PRNGKey(0), (G * T, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 256), jnp.float32)
    w = w * 0.06
    fn = pl.pallas_call(
        partial(chain_kernel_deferred, L),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * T, 256), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jfn = jax.jit(lambda x: fn(x, w))
    r = jfn(x)
    _ = float(r[0, 0])
    t0 = time.time()
    n = 20
    for _ in range(n):
        r = jfn(x)
    _ = float(r[0, 0])
    dt = (time.time() - t0) / n
    fl = 2.0 * G * T * 256 * 256 * L
    print(f"{'deferred':10s} T={T:5d} L={L} G={G}: {dt*1e3:7.2f} ms  "
          f"{fl/dt/1e12:6.1f} TFLOP/s")


def main():
    print("platform:", jax.devices()[0].platform)
    # bench-step-like totals: 1M rows, 25-layer chain
    for name, act in (("none", act_none), ("relu", act_relu),
                      ("softplus", act_softplus), ("sigmoid", act_sigmoid),
                      ("sp+gate", act_softplus_gate),
                      ("shared", act_shared_gate),
                      ("expm1gate", act_expm1_gate),
                      ("recip~", act_recip_approx_gate),
                      ("recipNt", act_recip_newton_gate)):
        run(1024, 25, 1024, act, name)
    run_deferred(1024, 25, 1024)
    # tile-size sweep on the pure chain
    for T, G in ((512, 2048), (2048, 512), (4096, 256)):
        run(T, 25, G, act_none, "none")
        run(T, 25, G, act_softplus, "softplus")
    # f32 dot reference
    run(1024, 25, 1024, act_none, "none-f32", bf16=False)


if __name__ == "__main__":
    main()
