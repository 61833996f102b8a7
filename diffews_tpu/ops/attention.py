"""Multi-head attention ops, including the KV-fusion (concat-KV) form.

The reference implements KV-fusion by mutating per-layer `k_bank`/`v_bank`
slots across two UNet dispatches and concatenating the banked support keys
and values after the query's own K/V
(`diffews/models/attention_processor.py:251-271`).  Here the same math is a
pure function: the caller passes the support K/V alongside and the query
tokens attend over `[own_kv ‖ folded_support_kv]`.  Softmax over keys is
permutation-invariant, so the concat order itself does not affect results;
it is kept "query first, supports after" to match the reference exactly
(`attention_processor.py:258,267`).

`kv_mask` supports padded n-shot batches: invalid support tokens get a -inf
bias, which is numerically identical to physically dropping them — this is
what lets variable 1..n-shot training jit once with static shapes
(SURVEY.md §7 "Variable n-shot under jit").
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def dense_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference attention in plain XLA ops.

    q: (B, Sq, H, D); k, v: (B, Skv, H, D); kv_bias: broadcastable to
    (B, H, Sq, Skv).  Returns (B, Sq, H, D).  Softmax in fp32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if kv_bias is not None:
        logits = logits + kv_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
    return out


def fused_kv_attention(
    q: jax.Array,
    k_own: jax.Array,
    v_own: jax.Array,
    k_sup: Optional[jax.Array],
    v_sup: Optional[jax.Array],
    *,
    shot_mask: Optional[jax.Array] = None,
    support_bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jax.Array:
    """Attention over [own tokens ‖ support tokens].

    Args:
      q, k_own, v_own: (B, S, H, D) query-stream projections.
      k_sup, v_sup: (B, N, S_ref, H, D) support-stream projections (one bank
        entry per shot), or None for plain self-attention.
      shot_mask: optional (B, N) bool; False marks padded shots whose tokens
        must not be attended to.
      support_bias: optional (B, N*S_ref) additive bias on support keys only
        (the attn-mask UNet variant's mask bias,
        `attention_processor_attnmask.py:213-244`).
      impl: "xla" (dense) or "pallas" (flash kernel; see
        `diffews_tpu.ops.flash_attention`).

    Returns (B, S, H, D).
    """
    b, s, h, d = q.shape
    if k_sup is None:
        k, v = k_own, v_own
        bias = None
    else:
        n, s_ref = k_sup.shape[1], k_sup.shape[2]
        # Fold shots into the sequence dim: (B, N, S_ref, H, D) -> (B, N*S_ref, H, D).
        # Matches the reference's batch->sequence fold of the bank
        # (attention_processor.py:256-258,265-267).
        k = jnp.concatenate([k_own, k_sup.reshape(b, n * s_ref, h, d)], axis=1)
        v = jnp.concatenate([v_own, v_sup.reshape(b, n * s_ref, h, d)], axis=1)
        sup_bias = None
        if shot_mask is not None:
            token_ok = jnp.repeat(shot_mask, s_ref, axis=1)  # (B, N*S_ref)
            sup_bias = jnp.where(token_ok, 0.0, NEG_INF).astype(jnp.float32)
        if support_bias is not None:
            sb = support_bias.astype(jnp.float32)
            sup_bias = sb if sup_bias is None else sup_bias + sb
        if sup_bias is not None:
            bias = jnp.concatenate(
                [jnp.zeros((b, s), jnp.float32), sup_bias], axis=1
            )[:, None, None, :]  # (B, 1, 1, Skv); own tokens unbiased
        else:
            bias = None

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return dense_attention(q, k, v, scale=scale, kv_bias=bias)
    elif impl == "pallas":
        from diffews_tpu.ops.flash_attention import flash_attention

        kv_mask = None
        if bias is not None:
            # Bias values are 0 / very-negative (shot padding and the 0/-1e4
            # mask bias both suppress to exp()==0 in fp32), so a boolean
            # mask is numerically equivalent.
            kv_mask = bias[:, 0, 0, :] >= -1e3
        return flash_attention(q, k, v, scale=scale, kv_mask=kv_mask)
    else:
        raise ValueError(f"unknown attention impl {impl!r}")


def _dense_attention_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_bias: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """`dense_attention` that also returns the f32 log-sum-exp (B, Sq, H)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_bias is not None:
        logits = logits + kv_bias.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(q.dtype), v)
    lse = (m + jnp.log(l))[..., 0].transpose(0, 2, 1)  # (B, Sq, H)
    return out, lse


def shot_parallel_fused_kv_attention(
    q: jax.Array,
    k_own: jax.Array,
    v_own: jax.Array,
    k_sup: jax.Array,
    v_sup: jax.Array,
    *,
    axis_name: str,
    shot_mask: Optional[jax.Array] = None,
    support_bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jax.Array:
    """`fused_kv_attention` with the support shots SHARDED over a mesh axis.

    The sequence-parallel answer to "nshot·hw outgrows a chip" (SURVEY §5:
    the reference folds all shots into one xformers KV sequence on a single
    GPU, `attention_processor.py:256-267` — its many-shot ceiling is that
    GPU's memory).  Here each device holds only its local shard of shots;
    it computes a partial softmax over `[own ‖ local shots]` (own tokens
    bias-masked everywhere except rank 0 so they count exactly once) and
    the exact global result is recovered with one `pmax` + two `psum`
    over the axis via the log-sum-exp merge

        out = Σ_i out_i·exp(lse_i − m) / Σ_i exp(lse_i − m),  m = max_i lse_i

    — O(Sq·H·D) collective payload (query-sized, never KV-sized), riding
    ICI.  Masked shards are safe: the -1e9 finite bias makes their weight
    underflow to exactly 0 (no NaN), and rank 0's own-token rows keep every
    query row live.

    Call under `shard_map` (or `jax.vmap`-free pmap-style code) with
    `axis_name` bound; per-device arguments:
      q, k_own, v_own: (B, S, H, D) replicated query-stream projections.
      k_sup, v_sup: (B, N_local, S_ref, H, D) — THIS device's shot shard.
      shot_mask: optional (B, N_local) bool validity of local shots.
      support_bias: optional (B, N_local*S_ref) additive key bias (attn-mask
        variant), local shard.
      impl: "xla" (dense, differentiable through the psum) or "pallas"
        (flash forward; eval-only — see `flash_attention_lse`).

    Returns (B, S, H, D), identical (up to reduction order) on every
    device to single-device `fused_kv_attention` over the gathered shots.
    """
    b, s, h, d = q.shape
    n, s_ref = k_sup.shape[1], k_sup.shape[2]
    k = jnp.concatenate([k_own, k_sup.reshape(b, n * s_ref, h, d)], axis=1)
    v = jnp.concatenate([v_own, v_sup.reshape(b, n * s_ref, h, d)], axis=1)

    rank = jax.lax.axis_index(axis_name)
    own_bias = jnp.where(rank == 0, 0.0, NEG_INF).astype(jnp.float32)
    own_bias = jnp.broadcast_to(own_bias, (b, s))
    sup_bias = jnp.zeros((b, n * s_ref), jnp.float32)
    if shot_mask is not None:
        token_ok = jnp.repeat(shot_mask, s_ref, axis=1)
        sup_bias = sup_bias + jnp.where(token_ok, 0.0, NEG_INF)
    if support_bias is not None:
        sup_bias = sup_bias + support_bias.astype(jnp.float32)
    bias = jnp.concatenate([own_bias, sup_bias], axis=1)  # (B, Skv_local)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from diffews_tpu.ops.flash_attention import flash_attention_lse

        # same 0-or-very-negative -> boolean equivalence as the single-
        # device pallas path above
        out_i, lse_i = flash_attention_lse(
            q, k, v, scale=scale, kv_mask=bias >= -1e3)
    elif impl == "xla":
        out_i, lse_i = _dense_attention_lse(
            q, k, v, scale=scale, kv_bias=bias[:, None, None, :])
    else:
        raise ValueError(f"unknown attention impl {impl!r}")

    # the shift by any constant cancels in num/den, so stopping gradients
    # through the pmax (which has no differentiation rule) is exact
    lse_max = jax.lax.stop_gradient(
        jax.lax.pmax(jax.lax.stop_gradient(lse_i), axis_name))  # (B, Sq, H)
    w = jnp.exp(lse_i - lse_max)
    num = jax.lax.psum(out_i.astype(jnp.float32) * w[..., None], axis_name)
    den = jax.lax.psum(w, axis_name)
    return (num / den[..., None]).astype(q.dtype)


def cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Cross-attention (text conditioning); context lengths are tiny (2/77).

    key_mask: optional (B, Skv) bool — True keeps a context token.  Mirrors
    the reference's optional cross-attention masking (`CAAttnProcessor2_0` /
    `CAXFormersAttnProcessor` with use_attn_mask,
    `attention_processor_attnmask.py:420+`), which its entry points never
    enable; provided for capability parity.
    """
    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
        bias = bias[:, None, None, :]
    return dense_attention(q, k, v, scale=scale, kv_bias=bias)


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, s, c = x.shape
    return x.reshape(b, s, heads, c // heads)


def merge_heads(x: jax.Array) -> jax.Array:
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)
