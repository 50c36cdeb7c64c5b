"""Embedding initializers (JAX).

Same init families as the reference (modules/base/initializers.py:9-60):
xavier (truncated-normal Glorot), normal (truncated normal, std 1/sqrt(d)),
uniform, unit (Gaussian rows L2-normalized), orthogonal.  All take explicit
PRNG keys — no global RNG.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_embeddings(key: jax.Array, shape, method: str, l2_norm: bool,
                    dtype=jnp.float32) -> jax.Array:
    if method == "xavier":
        emb = xavier_init(key, shape, dtype)
    elif method == "normal":
        emb = truncated_normal_init(key, shape, dtype)
    elif method == "uniform":
        emb = jax.random.uniform(key, shape, dtype=dtype)
    elif method == "unit":
        emb = random_unit_init(key, shape, dtype)
    else:
        raise ValueError(f"unknown init {method!r}")
    return l2_normalize(emb) if l2_norm else emb


def xavier_init(key, shape, dtype=jnp.float32):
    # Glorot normal, truncated at 2 std (TF xavier_initializer(uniform=False)).
    fan_in, fan_out = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def truncated_normal_init(key, shape, dtype=jnp.float32):
    std = 1.0 / math.sqrt(shape[1])
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def random_unit_init(key, shape, dtype=jnp.float32):
    v = jax.random.normal(key, shape, dtype)
    return l2_normalize(v)


def orthogonal_init(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # TF semantics: x / sqrt(max(sum(x^2), eps))
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))
