"""Pallas TPU flash attention for the fused-KV (concat-KV) path.

This is the north-star kernel (SURVEY.md §5 "long-context"): DiffewS query
tokens attend over `[hw own tokens ‖ nshot * hw support tokens]` — at 512px
that is Sq=4096, Skv=4096*(1+n) per self-attention layer.  The XLA dense
path materializes the (heads, 4096, 4096*(1+n)) probability tensor in HBM
(hundreds of MB per layer per episode); this kernel keeps the online-softmax
running state (m, l, acc) in VMEM and streams K/V blocks, so attention
becomes bandwidth-light and batchable.

Design notes:
  - grid (B*H, Sq/bq, Skv/bk), KV innermost with "arbitrary" semantics —
    TPU grid steps run sequentially per core, so VMEM scratch carries the
    online-softmax state across KV blocks;
  - optional `kv_mask` (B, Skv) adds -inf bias for padded n-shot support
    tokens (same semantics as the dense path's shot masking);
  - fp32 accumulation; bf16/f32 inputs;
  - `custom_vjp`: two Pallas backward kernels recompute probabilities from
    the saved log-sum-exp (no probability tensor in HBM in either direction)
    — a dq pass (parallel over q blocks, reduction over kv blocks) and a
    dk/dv pass (parallel over kv blocks, reduction over q blocks);
  - non-TPU backends run the kernel in interpreter mode (tests).

MEASURED NEGATIVE RESULT (1x v5e): keeping the dot operands in bf16
(preferred_element_type=f32) instead of casting to f32 first — the
canonical GPU-flash recipe — made the 512px training step 40% SLOWER
(487 -> 686 ms; tools/tpu_train_smoke.py A/B).  Mosaic's relayouts for
(2,1)-packed bf16 vregs at these block shapes cost more than the MXU
dtype win.  Keep the f32 casts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_block(size: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128, 64, 32, 16, 8):
        if b <= preferred and size % b == 0 and b <= size:
            return b
    return size


# Run ONLY the p@v matmul with bf16 operands (f32 accumulate) when inputs
# are bf16.  The all-bf16 formulation measured 40% SLOWER (Mosaic relayout
# of bf16 q/k blocks for the QK^T dot); keeping QK^T in f32 and paying one
# f32->bf16 pack of the probabilities wins a consistent ~5% (1x v5e,
# tools/tpu_flash_block_scan.py avdot: kv 8192 8.42 vs 8.82 ms).  f32
# inputs are unaffected (v stays f32, so p does too) — CPU parity tests
# and full-precision eval keep exact f32 math.
AV_BF16 = True

# Same pattern offered for the backward's three accumulation dots when
# inputs are bf16 (COMPUTED p/ds cast to bf16 against NATIVE-bf16 loaded
# blocks: g for dV, k for dQ, q for dK; f32 accumulation).  MEASURED A WASH
# on 1x v5e (tools/tpu_flash_bwd_bench.py: fwd+bwd chain at sq4096
# kv8192 16.60 ms f32-dots vs 16.73 bf16; kv4096 10.63 vs 10.83) — unlike
# the forward, the backward at bk<=512 is bound by the (bq, bk) p/ds
# recompute on the VPU, not the MXU dots, so halving dot cost buys
# nothing.  Default OFF: training keeps exact-f32 kernel math for free.
BWD_BF16 = False


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, *, scale, kv_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    k = k_ref[0].astype(jnp.float32)          # (bk, d)
    v = (v_ref[0] if AV_BF16 and v_ref.dtype == jnp.bfloat16
         else v_ref[0].astype(jnp.float32))   # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (bq, bk)
    if mask_ref is not None:
        # mask arrives as (1, bk) int8; arithmetic bias avoids Mosaic's
        # unsupported 1-D i1 vector relayouts
        s = s + (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_INF

    m_prev = m_scr[:, :1]                      # (bq, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                     # (bq, bk)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == kv_blocks - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # lse carried as (bq, 1): TPU block shapes need the trailing dims
        # either tile-aligned or equal to the full array dims
        lse_ref[0] = m_scr[:, :1] + jnp.log(l_scr[:, :1])


def _flash_forward(q, k, v, kv_mask, scale, block_q, block_k, interpret):
    """q,k,v: (BH, S, D) / (BH, Skv, D); kv_mask: (BH, Skv) int8 or None."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    bq = _pick_block(sq, block_q)
    bk = _pick_block(skv, block_k)
    kv_blocks = skv // bk

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),
        pl.BlockSpec((1, bk, d), lambda i, qi, ki: (i, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda i, qi, ki: (i, ki, 0)),
    ]
    args = [q, k, v]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda i, qi, ki: (i, 0, ki)))
        args.append(kv_mask[:, None, :])
        kernel = functools.partial(_flash_kernel, scale=scale, kv_blocks=kv_blocks)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, ls, m, l, a, **kw: _flash_kernel(
                qr, kr, vr, None, o, ls, m, l, a, **kw
            ),
            scale=scale, kv_blocks=kv_blocks,
        )

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, sq // bq, kv_blocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda i, qi, ki: (i, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out, lse[..., 0]




# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, mask_ref,
                   dq_ref, dq_scr, *, scale, kv_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (1, bq)
    delta = delta_ref[0]      # (1, bq)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if mask_ref is not None:
        s = s + (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_INF
    p = jnp.exp(s - lse.T)                       # (bq, bk)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta.T)
    k_dot = (k_ref[0] if BWD_BF16 and k_ref.dtype == jnp.bfloat16 else k)
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k_dot.dtype), k_dot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(j == kv_blocks - 1)
    def _done():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, mask_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, q_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (1, bq)
    delta = delta_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if mask_ref is not None:
        s = s + (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_INF
    p = jnp.exp(s - lse.T)                       # (bq, bk)
    g_dot = (g_ref[0] if BWD_BF16 and g_ref.dtype == jnp.bfloat16 else g)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(g_dot.dtype), g_dot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta.T)
    q_dot = (q_ref[0] if BWD_BF16 and q_ref.dtype == jnp.bfloat16 else q)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q_dot.dtype), q_dot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(j == q_blocks - 1)
    def _done():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k,
                    interpret):
    """Flash-attention backward: returns (dq, dk, dv).

    KV blocks are clamped to 512 regardless of the forward's choice: the
    forward wins 1.65x from block_k=2048 (fewer online-softmax rescales),
    but the backward recomputes p/dp at (bq, bk) f32 in BOTH passes and the
    bigger tiles slow the full train step 565 vs 471 ms (1x v5e,
    tools/tpu_train_smoke.py)."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    bq = _pick_block(sq, block_q)
    bk = _pick_block(skv, min(block_k, 512))
    kv_blocks, q_blocks = skv // bk, sq // bq

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    lse3 = lse[:, None, :]       # (BH, 1, Sq)
    delta3 = delta[:, None, :]

    common_in = [q, k, v, g, lse3, delta3]
    mask3 = None if kv_mask is None else kv_mask[:, None, :]

    # --- dq: parallel over q blocks, reduce over kv blocks ---
    dq_specs = [
        pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),   # q
        pl.BlockSpec((1, bk, d), lambda i, qi, ki: (i, ki, 0)),   # k
        pl.BlockSpec((1, bk, d), lambda i, qi, ki: (i, ki, 0)),   # v
        pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),   # g
        pl.BlockSpec((1, 1, bq), lambda i, qi, ki: (i, 0, qi)),   # lse
        pl.BlockSpec((1, 1, bq), lambda i, qi, ki: (i, 0, qi)),   # delta
    ]
    args = list(common_in)
    if mask3 is not None:
        dq_specs.append(pl.BlockSpec((1, 1, bk), lambda i, qi, ki: (i, 0, ki)))
        args.append(mask3)
        dq_kernel = functools.partial(_bwd_dq_kernel, scale=scale,
                                      kv_blocks=kv_blocks)
    else:
        dq_kernel = functools.partial(
            lambda qr, kr, vr, gr, lr, dr, o, s, **kw: _bwd_dq_kernel(
                qr, kr, vr, gr, lr, dr, None, o, s, **kw),
            scale=scale, kv_blocks=kv_blocks)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, q_blocks, kv_blocks),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)

    # --- dk/dv: parallel over kv blocks, reduce over q blocks ---
    dkv_specs = [
        pl.BlockSpec((1, bq, d), lambda i, ki, qi: (i, qi, 0)),   # q
        pl.BlockSpec((1, bk, d), lambda i, ki, qi: (i, ki, 0)),   # k
        pl.BlockSpec((1, bk, d), lambda i, ki, qi: (i, ki, 0)),   # v
        pl.BlockSpec((1, bq, d), lambda i, ki, qi: (i, qi, 0)),   # g
        pl.BlockSpec((1, 1, bq), lambda i, ki, qi: (i, 0, qi)),   # lse
        pl.BlockSpec((1, 1, bq), lambda i, ki, qi: (i, 0, qi)),   # delta
    ]
    args = list(common_in)
    if mask3 is not None:
        dkv_specs.append(pl.BlockSpec((1, 1, bk), lambda i, ki, qi: (i, 0, ki)))
        args.append(mask3)
        dkv_kernel = functools.partial(_bwd_dkv_kernel, scale=scale,
                                       q_blocks=q_blocks)
    else:
        dkv_kernel = functools.partial(
            lambda qr, kr, vr, gr, lr, dr, ok, ov, sk, sv, **kw: _bwd_dkv_kernel(
                qr, kr, vr, gr, lr, dr, None, ok, ov, sk, sv, **kw),
            scale=scale, q_blocks=q_blocks)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, kv_blocks, q_blocks),
        in_specs=dkv_specs,
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda i, ki, qi: (i, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda i, ki, qi: (i, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv, d), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, block_sizes, interpret):
    out, _ = _flash_forward(q, k, v, None, scale, *block_sizes, interpret)
    return out


def _flash_fwd(q, k, v, scale, block_sizes, interpret):
    out, lse = _flash_forward(q, k, v, None, scale, *block_sizes, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_sizes, interpret, res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, None, out, lse, g, scale, *block_sizes,
                           interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_masked(q, k, v, kv_mask, scale, block_sizes, interpret):
    out, _ = _flash_forward(q, k, v, kv_mask, scale, *block_sizes, interpret)
    return out


def _flash_masked_fwd(q, k, v, kv_mask, scale, block_sizes, interpret):
    out, lse = _flash_forward(q, k, v, kv_mask, scale, *block_sizes, interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_masked_bwd(scale, block_sizes, interpret, res, g):
    q, k, v, kv_mask, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, out, lse, g, scale,
                                 *block_sizes, interpret)
    return dq, dk, dv, None


_flash_masked.defvjp(_flash_masked_fwd, _flash_masked_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,
    block_q: int = 512,
    block_k: Optional[int] = None,
) -> jax.Array:
    """Flash attention over (B, Sq, H, D) query and (B, Skv, H, D) key/value.

    kv_mask: optional (B, Skv) bool (True = attend).  Returns (B, Sq, H, D).

    block_k defaults to 2048 for head dims <= 128 (the UNet's d=64): the
    dominant cost at the SD 64^2 stage is the per-KV-block online-softmax
    rescale chain on the VPU serializing against the MXU, and 4x larger KV
    blocks cut it 1.65x (1x v5e, tools/tpu_flash_block_scan.py: kv 8192
    bq512 bk512 14.5 ms / bk2048 8.8 ms; kv 4096: 9.3 / 6.2 ms).  Large
    head dims (the VAE mid-attention's d=512) keep 512 to fit VMEM
    (bq*bk f32 probabilities + 3 f32 block casts; bq2048/bk1024 at d=64
    already OOMs).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if block_k is None:
        block_k = 2048 if d <= 128 else 512
    interpret = jax.default_backend() != "tpu"

    # (B, S, H, D) -> (B*H, S, D)
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)

    if kv_mask is not None:
        m = jnp.repeat(kv_mask.astype(jnp.int8), h, axis=0)  # (B*H, Skv)
        out = _flash_masked(qh, kh, vh, m, float(scale), (block_q, block_k), interpret)
    else:
        out = _flash(qh, kh, vh, float(scale), (block_q, block_k), interpret)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def flash_attention_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,
    block_q: int = 512,
    block_k: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """`flash_attention` that also returns the f32 log-sum-exp.

    Returns `(out, lse)` with out (B, Sq, H, D) and lse (B, Sq, H) =
    `max_j(s_j) + log(sum_j exp(s_j - max))` over that row's keys.  This is
    the partial-softmax statistic the shot-parallel attention combine needs
    (`ops/attention.py::shot_parallel_fused_kv_attention`): device-local
    results merge exactly via `out = Σ_i out_i·exp(lse_i − lse_g) /
    Σ_i exp(lse_i − lse_g)`.

    FORWARD-ONLY: this path bypasses the custom-VJP wrappers (the combine
    is an eval/serving feature); take gradients through the dense
    (`impl="xla"`) formulation instead.
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if block_k is None:
        block_k = 2048 if d <= 128 else 512
    interpret = jax.default_backend() != "tpu"

    qh = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    m = (None if kv_mask is None
         else jnp.repeat(kv_mask.astype(jnp.int8), h, axis=0))
    out, lse = _flash_forward(qh, kh, vh, m, float(scale),
                              block_q, block_k, interpret)
    return (out.reshape(b, h, sq, d).transpose(0, 2, 1, 3),
            lse.reshape(b, h, sq).transpose(0, 2, 1))
