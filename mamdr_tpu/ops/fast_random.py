"""Counter-based hash PRNG for dropout masks.

jax's default threefry PRNG costs more FLOPs generating a [1024, 256]
dropout mask than the surrounding matmuls at CTR-model sizes (~30% of the
fused MAMDR epoch measured on v5e). Dropout needs statistical — not
cryptographic — randomness, so masks here come from a murmur3-style integer
finalizer over a broadcasted counter: ~6 VPU int-ops per element, fully
fused by XLA, deterministic given (seed, shape, salt).

The flax Dropout replacement (models.layers.FastDropout) still draws its
per-call seed from the framework's threefry key stream (one tiny fold per
layer call), so runs remain reproducible end-to-end under the same PRNGKey.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _finalize(x: jax.Array) -> jax.Array:
    """murmur3 fmix32: avalanche a uint32 lattice."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_uniform(seed: jax.Array, shape) -> jax.Array:
    """Uniform [0,1) float32 of `shape` from a scalar uint32 seed."""
    n = 1
    for s in shape:
        n *= int(s)
    # 2D iota (TPU requires >=2D), then flatten/reshape
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    x = idx * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    x = _finalize(x)
    # 24-bit mantissa -> [0, 1)
    return (x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def dropout_mask(seed: jax.Array, rate: float, shape) -> jax.Array:
    """Keep-mask (bool) with P(keep) = 1-rate."""
    return hash_uniform(seed, shape).reshape(shape) >= jnp.float32(rate)


def key_to_seed(key: jax.Array) -> jax.Array:
    """Fold a jax PRNG key into a scalar uint32 seed."""
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    return kd[0] ^ (kd[-1] * jnp.uint32(7919))
