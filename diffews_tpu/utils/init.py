"""Parameter initializers (torch-default-compatible fan-in uniform).

Real DiffewS runs always start from pretrained SD-2.1 weights; these inits
exist for tests, surgery of new modules (e.g. `conv_in_ref`) and
training-from-scratch capability.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def conv_params(rng, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def linear_params(rng, cin: int, cout: int, dtype=jnp.float32, bias: bool = True) -> dict:
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(cin)
    p = {"kernel": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return p


def norm_params(c: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def embedding_params(rng, n: int, dim: int, dtype=jnp.float32, std: float = 0.02) -> dict:
    return {"embedding": jax.random.normal(rng, (n, dim), dtype) * std}


class RngStream:
    """Deterministic stream of subkeys for sequential module init."""

    def __init__(self, rng):
        self._rng = rng

    def __call__(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub
