"""Pallas flash-attention kernel vs dense reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.ops.attention import dense_attention, fused_kv_attention
from diffews_tpu.ops.flash_attention import flash_attention


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("sq,skv,d", [
    # odd/prime lengths force _pick_block to fall back to a full-extent
    # block; non-power-of-two head dims exercise the (bq, d) scratch
    (96, 112, 80),
    (97, 101, 64),   # primes: single q/kv block each
    (64, 160, 48),
])
def test_matches_dense_odd_shapes(sq, skv, d):
    """The kernel must stay correct off the 64^2-tuned happy path — the
    VAE mid-attention (d=512) and padded few-shot folds hit irregular
    extents in practice."""
    b, h = 2, 2
    q = _rand(b, sq, h, d, seed=31)
    k = _rand(b, skv, h, d, seed=32)
    v = _rand(b, skv, h, d, seed=33)
    got = flash_attention(q, k, v)
    want = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sq,skv", [(64, 64), (64, 128), (128, 384)])
def test_matches_dense(sq, skv):
    b, h, d = 2, 2, 64
    q = _rand(b, sq, h, d, seed=1)
    k = _rand(b, skv, h, d, seed=2)
    v = _rand(b, skv, h, d, seed=3)
    got = flash_attention(q, k, v, block_q=64, block_k=64)
    want = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_masked_matches_dense_bias():
    b, sq, skv, h, d = 1, 64, 128, 2, 64
    q = _rand(b, sq, h, d, seed=4)
    k = _rand(b, skv, h, d, seed=5)
    v = _rand(b, skv, h, d, seed=6)
    mask = jnp.asarray(np.random.default_rng(7).random((b, skv)) > 0.3)
    got = flash_attention(q, k, v, kv_mask=mask, block_q=64, block_k=64)
    bias = jnp.where(mask, 0.0, -1e9)[:, None, None, :]
    want = dense_attention(q, k, v, kv_bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_grad_matches_dense():
    b, sq, skv, h, d = 1, 64, 128, 1, 64
    q = _rand(b, sq, h, d, seed=8)
    k = _rand(b, skv, h, d, seed=9)
    v = _rand(b, skv, h, d, seed=10)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


def test_bf16_grad_close_to_dense_f32():
    """bf16 inputs with BWD_BF16 forced on exercise the computed-operand
    bf16 dots (p/ds cast to bf16 against native-bf16 blocks,
    flash_attention.py — measured perf-neutral, kept correct); gradients
    must stay within bf16 rounding of the dense f32 reference."""
    import diffews_tpu.ops.flash_attention as FA

    b, sq, skv, h, d = 2, 64, 96, 2, 16
    q = _rand(b, sq, h, d, seed=40).astype(jnp.bfloat16)
    k = _rand(b, skv, h, d, seed=41).astype(jnp.bfloat16)
    v = _rand(b, skv, h, d, seed=42).astype(jnp.bfloat16)
    old, FA.BWD_BF16 = FA.BWD_BF16, True

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(
            dense_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32)) ** 2)

    try:
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        FA.BWD_BF16 = old
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        a, b_ = np.asarray(a, np.float32), np.asarray(b_)
        rel = np.max(np.abs(a - b_)) / max(1e-6, np.max(np.abs(b_)))
        assert rel < 0.03, rel


def test_fused_kv_pallas_path_matches_xla():
    b, n, s, h, d = 1, 2, 64, 2, 64
    q = _rand(b, s, h, d, seed=11)
    k_own = _rand(b, s, h, d, seed=12)
    v_own = _rand(b, s, h, d, seed=13)
    k_sup = _rand(b, n, s, h, d, seed=14)
    v_sup = _rand(b, n, s, h, d, seed=15)
    mask = jnp.asarray([[True, False]])
    got = fused_kv_attention(q, k_own, v_own, k_sup, v_sup,
                             shot_mask=mask, impl="pallas")
    want = fused_kv_attention(q, k_own, v_own, k_sup, v_sup,
                              shot_mask=mask, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_bf16_inputs():
    b, sq, skv, h, d = 1, 64, 64, 1, 64
    q = _rand(b, sq, h, d, seed=16).astype(jnp.bfloat16)
    k = _rand(b, skv, h, d, seed=17).astype(jnp.bfloat16)
    v = _rand(b, skv, h, d, seed=18).astype(jnp.bfloat16)
    got = flash_attention(q, k, v, block_q=64, block_k=64)
    assert got.dtype == jnp.bfloat16
    want = dense_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=3e-2, atol=3e-2)


def test_masked_grad_matches_dense():
    b, sq, skv, h, d = 1, 64, 128, 1, 64
    q = _rand(b, sq, h, d, seed=20)
    k = _rand(b, skv, h, d, seed=21)
    v = _rand(b, skv, h, d, seed=22)
    mask = jnp.asarray(np.random.default_rng(23).random((b, skv)) > 0.4)
    bias = jnp.where(mask, 0.0, -1e9)[:, None, None, :]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask,
                                       block_q=64, block_k=64) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, kv_bias=bias) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)
