"""NeRF-style sinusoidal positional encoding.

Semantics match the reference embedder
(/root/reference/lib/models/tools/PositionEncoding.py:45-94): log-spaced
frequency bands 2^0..2^(L-1), output layout
[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with each entry
the full d-dim vector (frequency-major, sin before cos).
"""

from __future__ import annotations

import jax.numpy as jnp


def embedding_dim(d_in: int, num_freqs: int, include_input: bool = True) -> int:
    """Output feature size of positional_encoding."""
    return d_in * ((1 if include_input else 0) + 2 * num_freqs)


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """Encode x[..., d] -> [..., d*(include_input + 2*num_freqs)].

    Frequency-major layout: for each band f, the sin(f*x) block precedes
    the cos(f*x) block, matching the reference ordering so weights keyed
    to column positions (e.g. geometric init zeroing) line up.
    """
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # [L]
    # [..., L, d]
    xb = x[..., None, :] * freqs[:, None]
    # [..., L, 2, d]: sin block then cos block per frequency
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
