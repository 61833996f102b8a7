"""Pallas TPU fused GroupNorm(+SiLU) for conv-heavy NHWC stacks.

Why this exists: XLA:TPU spatially partitions large convolutions
(512^2-scale activations). Any cross-spatial reduction between two convs —
i.e. GroupNorm statistics — forces a layout reconciliation, and XLA inserts
full-tensor layout-conversion copies (~1.8 GB per VAE resnet block at 512px,
measured: block runs at 21% of bf16 peak while its convs alone run at 81%).
Reformulating the reduction (native axes, bf16 stats, einsum contractions,
optimization barriers) does not remove the copies.

Two Pallas kernels give the reduction an opaque boundary XLA cannot
entangle with the convs' layouts:

  - stats kernel: grid (B, H-blocks), one bf16 read of x, accumulates
    per-channel sum / sum-of-squares in fp32 VMEM scratch;
  - apply kernel: y = act(x * A + B), one read + one write, with the
    optional SiLU fused so the activation costs no extra HBM pass.

Group math (fold (B,C) channel sums to (B,G) group stats, rsqrt, compose
the per-channel affine with the GN scale/bias) happens between the kernels
in plain XLA — it touches only (B,C)-sized tensors.

Differentiation: `custom_vjp` whose backward runs `jax.vjp` of the XLA
reference formulation (`diffews_tpu.models.layers.group_norm`), so the op
is trainable everywhere while the forward stays copy-free. Non-TPU backends
use the XLA reference directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h: int, w: int, c: int, budget_bytes: int = 1 << 20) -> int:
    # budget is per block-operand; the apply kernel holds in+out blocks with
    # double buffering (4x), so 1 MiB blocks keep scoped VMEM under the
    # 16 MiB limit with headroom.
    """Largest divisor of h whose (bh, w, c) bf16 block fits the budget."""
    best = 1
    for bh in range(1, h + 1):
        if h % bh == 0 and bh * w * c * 2 <= budget_bytes:
            best = bh
    return best


def _stats_kernel(x_ref, s1_ref, s2_ref, acc1, acc2, *, h_blocks):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    x = x_ref[0].astype(jnp.float32)            # (bh, W, C)
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    acc1[:] += jnp.sum(flat, axis=0, keepdims=True)           # (1, C)
    acc2[:] += jnp.sum(jnp.square(flat), axis=0, keepdims=True)

    @pl.when(j == h_blocks - 1)
    def _done():
        s1_ref[0] = acc1[:]
        s2_ref[0] = acc2[:]


def _apply_kernel(x_ref, a_ref, b_ref, y_ref, *, act):
    x = x_ref[0]                                 # (bh, W, C)
    y = x * a_ref[0] + b_ref[0]                  # A/B broadcast (1, C)
    if act == "silu":
        yf = y.astype(jnp.float32)
        y = (yf * jax.nn.sigmoid(yf)).astype(y.dtype)
    y_ref[0] = y


def _gn_silu_fwd_pallas(x, scale, bias, groups, eps, act, interpret):
    b, h, w, c = x.shape
    bh = _pick_bh(h, w, c)
    h_blocks = h // bh

    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, h_blocks=h_blocks),
        grid=(b, h_blocks),
        in_specs=[pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x)
    s1 = s1[:, 0, :]                              # (B, C)
    s2 = s2[:, 0, :]

    n = h * w * (c // groups)
    s1g = s1.reshape(b, groups, -1).sum(-1)       # (B, G)
    s2g = s2.reshape(b, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // groups, axis=1)  # (B, C)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    sf = scale.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    A = (inv_c * sf[None]).astype(x.dtype)[:, None, :]        # (B, 1, C)
    B_ = (bf[None] - mean_c * inv_c * sf[None]).astype(x.dtype)[:, None, :]

    y = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(b, h_blocks),
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x, A, B_)
    return y


def _xla_reference(x, scale, bias, groups, eps, act):
    from diffews_tpu.models import layers as L

    y = L.group_norm({"scale": scale, "bias": bias}, x, groups=groups, eps=eps)
    if act == "silu":
        y = jax.nn.silu(y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_silu(x, scale, bias, groups, eps, act, interpret):
    return _gn_silu_fwd_pallas(x, scale, bias, groups, eps, act, interpret)


def _gn_silu_fwd(x, scale, bias, groups, eps, act, interpret):
    out = _gn_silu_fwd_pallas(x, scale, bias, groups, eps, act, interpret)
    return out, (x, scale, bias)


def _gn_silu_bwd(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _xla_reference(x, s, b, groups, eps, act), x, scale, bias
    )
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def group_norm_act(
    params,
    x: jax.Array,
    *,
    groups: int,
    eps: float,
    act: Optional[str] = None,
    impl: str = "auto",
) -> jax.Array:
    """GroupNorm with optionally fused activation.

    impl: "auto", "xla", or "pallas" (interpret mode off-TPU, for tests).

    MEASURED NEGATIVE RESULT (1x v5e, tools/tpu_vae_matrix.py): the Pallas
    kernels win slightly on an isolated resnet chain (11.3 -> 10.7 ms) but
    LOSE badly inside the full VAE (encode x24: 169 -> 275 ms; decode:
    46 -> 82 ms) — the opaque kernel boundaries also break XLA's profitable
    cross-layer fusions, and the layout copies simply move to the pallas
    custom-call edges ({3,2,1,0} operand constraint vs the convs'
    {3,1,2,0}). "auto" therefore resolves to the XLA formulation; the
    kernels stay for explicit experimentation.
    """
    if impl == "auto":
        impl = "xla"
    if impl == "xla" or x.ndim != 4:
        return _xla_reference(x, params["scale"], params["bias"], groups, eps,
                              act or "none")
    interpret = jax.default_backend() != "tpu"
    return _gn_silu(x, params["scale"], params["bias"], groups, eps,
                    act or "none", interpret)
