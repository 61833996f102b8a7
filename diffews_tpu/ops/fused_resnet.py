"""Pallas TPU fused resnet megakernel: GN-apply + SiLU + 3x3 conv (+residual).

Why: the VAE resnet stack (`models/layers.py::resnet_block`) composes to
only ~21% of bf16 peak on v5e even though its convs alone run at 78-97% —
XLA spatially partitions the 512^2-scale convolutions and the GroupNorm
statistics reduction between them forces full-tensor layout-conversion
copies (~1.8 GB per block, see `diffews_tpu.ops.groupnorm`).  Splitting
only the GN into a Pallas op does not help: the copies move to the pallas
custom-call edges ({3,2,1,0} operand layout vs the convs' {3,1,2,0}).

The fix is to swallow the whole chain: this kernel reads x from HBM ONCE
per conv, applies the GroupNorm affine (statistics are per-(B,C) scalars
computed by the previous megakernel in the chain), the SiLU, and the 3x3
convolution as nine accumulating MXU matmuls over shifted window slices,
adds the optional residual, writes the output ONCE, and accumulates the
per-channel sum/sum-of-squares the NEXT GroupNorm needs — so a resnet
block becomes two HBM round-trips with zero layout traffic in between.

Halo handling: the grid walks (batch x row-tiles); each step DMAs the
row-tile plus one halo row above/below from HBM into a double-buffered
VMEM scratch slot (the next tile's DMA issues before the current tile's
compute, hiding the copy).  Width halos are zero-padded columns in the
scratch; invalid halo rows/columns are masked to zero AFTER the affine +
SiLU (conv zero-padding applies to the activation, not the raw input).

Differentiation: `custom_vjp` whose backward runs `jax.vjp` of the XLA
reference formulation — the VAE is frozen in DiffewS training
(`train...v3.py:1103-1104` in the reference), so the backward is for
API completeness, not a hot path.

MEASURED RESULT (1x v5e, tools/tpu_fused_resnet_bench.py): the kernel
plateaus at ~43 TF/s regardless of dot formulation (9 separate K=C taps
bf16: 38.8; f32 operands: 43.8; lane-concat K=3C taps bf16: 42.9 — the
VPU chain of affine/silu/mask/rolls serializes against the MXU).  That
beats the layout-copy-taxed XLA chain when the chip is NOT saturated —
full VAE encode b3: 55.9 ms fused vs 74.6 XLA — but loses once batch
saturates XLA's spatially-partitioned convs at 78-97% of bf16 peak
(encode b24: 226 vs 181 ms; decode b8: 176 vs 145 ms).  The pipeline
therefore selects "fused" only for encode batches <= 4 images (the
single-episode latency path); "auto" stays "xla".

Reference behavior being replaced: diffusers ResnetBlock2D as invoked by
the SD-2.1 VAE (`diffews/marigold_pipeline_rgb_latent_noise.py:649,787`
encode/decode calls in the reference).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffews_tpu.ops.groupnorm import group_norm_act

_VMEM_BUDGET = 12 << 20

# Timing-ablation knobs for tools/tpu_fused_resnet_bench.py ("ablate" mode):
# each skips one VPU stage of the kernel (results become WRONG) to bisect
# the ~43 TF/s plateau.  Never set outside the bench.
ABLATE = {"silu": False, "mask": False, "rolls": False, "stats": False}


def _pick_bh(h: int, w: int, cin: int, cout: int, esize: int = 2) -> int:
    """Largest divisor of h fitting the VMEM budget (2 slots + weights +
    f32 accumulator + output block), preferring >=512 matmul rows."""
    best = 1
    for bh in range(1, h + 1):
        if h % bh:
            continue
        need = (2 * (bh + 2) * (w + 16) * cin * esize     # scratch slots
                + (bh + 2) * (w + 16) * cin * 4           # f32 activation
                + bh * (w + 16) * cout * 4                # f32 partial
                + bh * w * cout * 4                       # f32 accumulator
                + 9 * cin * cout * esize                  # weights
                + 2 * bh * w * cout * esize)              # y block + residual
        if need <= _VMEM_BUDGET:
            best = bh
        if bh * w >= 2048 and best >= 8:
            break
    return best


def _kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, *args,
            n_h, bh, width, cin, cout, total, has_res, out_dtype):
    if has_res:
        res_ref = args[0]
        args = args[1:]
    y_ref, s1_ref, s2_ref, slots, sems, acc1, acc2 = args

    idx = pl.program_id(0)

    # data lives at sublane-aligned column offset 8 (cols 8..8+W-1); cols 7
    # and 8+W are the conv's zero padding; width shifts happen via circular
    # rolls so every compute slice starts at offset 0 (Mosaic requires
    # tile-aligned sublane slicing)
    def _center(slot, b_, j_):
        return pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(j_ * bh, bh)],
            slots.at[slot, pl.ds(1, bh), pl.ds(8, width)],
            sems.at[slot, 0])

    def _top(slot, b_, j_):
        return pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(j_ * bh - 1, 1)],
            slots.at[slot, pl.ds(0, 1), pl.ds(8, width)],
            sems.at[slot, 1])

    def _bottom(slot, b_, j_):
        return pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds((j_ + 1) * bh, 1)],
            slots.at[slot, pl.ds(bh + 1, 1), pl.ds(8, width)],
            sems.at[slot, 2])

    def _start(i):
        slot = jax.lax.rem(i, 2)
        b_ = i // n_h
        j_ = i - b_ * n_h
        _center(slot, b_, j_).start()

        @pl.when(j_ > 0)
        def _():
            _top(slot, b_, j_).start()

        @pl.when(j_ < n_h - 1)
        def _():
            _bottom(slot, b_, j_).start()

    @pl.when(idx == 0)
    def _():
        _start(0)

    @pl.when(idx + 1 < total)
    def _():
        _start(idx + 1)

    slot = jax.lax.rem(idx, 2)
    b_i = idx // n_h
    j = idx - b_i * n_h
    _center(slot, b_i, j).wait()

    @pl.when(j > 0)
    def _():
        _top(slot, b_i, j).wait()

    @pl.when(j < n_h - 1)
    def _():
        _bottom(slot, b_i, j).wait()

    wpad = width + 16
    t = slots[slot]                                    # (bh+2, Wpad, Cin)
    actf = t.astype(jnp.float32) * a_ref[0] + b_ref[0]  # f32 affine + SiLU
    act = actf if ABLATE["silu"] else actf * jax.nn.sigmoid(actf)
    if not ABLATE["mask"]:
        # zero the conv padding AFTER the activation (silu(affine(0)) != 0):
        # everything outside the data columns, row halos at image boundaries
        row = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, wpad, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, wpad, 1), 1)
        valid = ((col >= 8) & (col < 8 + width)
                 & ((row >= 1) | (j > 0))
                 & ((row <= bh) | (j < n_h - 1)))
        act = jnp.where(valid, act, 0.0)
    act = act.astype(t.dtype)                          # one cast, bf16 dots

    # conv as 3 column-taps, each one (bh*wpad, 3*Cin) @ (3*Cin, Cout) dot:
    # the 3 row-taps concatenate on the LANE dim (free), the dots run over
    # the FULL padded width at the input dtype (bf16 MXU rate; +16/W FLOP
    # overhead), and the width shift happens on the f32 partial output via
    # a 32-bit rotate (Mosaic's rotate has no bf16 path, so shifting the
    # activation instead would force f32 dots — 44 TF/s ceiling on v5e)
    patch3 = jnp.concatenate(
        [act[dh:dh + bh, :, :] for dh in range(3)], axis=-1,
    ).reshape(bh * wpad, 3 * cin)
    acc = jnp.zeros((bh, width, cout), jnp.float32)
    for dw in range(3):
        part = jnp.dot(patch3, w_ref[dw],
                       preferred_element_type=jnp.float32)
        part = part.reshape(bh, wpad, cout)
        if ABLATE["rolls"]:
            acc += part[:, 0:width, :]
        else:
            # output col w reads partial col (w+7+dw): roll left by 7+dw
            # (positive shift: np.roll semantics, wpad-k == roll left by k)
            acc += pltpu.roll(part, shift=wpad - 7 - dw, axis=1)[:, 0:width, :]
    acc += bias_ref[0].astype(jnp.float32)
    y = acc.astype(out_dtype)
    if has_res:
        y = y + res_ref[0]
    y_ref[0] = y

    yf = y.astype(jnp.float32).reshape(bh * width, cout)

    @pl.when(j == 0)
    def _():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    if not ABLATE["stats"]:
        acc1[:] += jnp.sum(yf, axis=0, keepdims=True)
        acc2[:] += jnp.sum(jnp.square(yf), axis=0, keepdims=True)

    @pl.when(j == n_h - 1)
    def _():
        s1_ref[0] = acc1[:]
        s2_ref[0] = acc2[:]


def _fwd_pallas(x, a, b, w, bias, residual, interpret):
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, width, cin, cout, x.dtype.itemsize)
    n_h = h // bh
    total = bsz * n_h

    a3 = a.astype(jnp.float32).reshape(bsz, 1, cin)
    b3 = b.astype(jnp.float32).reshape(bsz, 1, cin)
    bias2 = bias.reshape(1, cout)

    tile = lambda i: (i // n_h, i % n_h, 0, 0)
    per_b = lambda i: (i // n_h, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1, cin), per_b),
        pl.BlockSpec((1, 1, cin), per_b),
        pl.BlockSpec((3, 3 * cin, cout), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, cout), lambda i: (0, 0)),
    ]
    # w3[dw] = [w[0,dw] ; w[1,dw] ; w[2,dw]] stacked on the K dim, matching
    # the kernel's lane-concat of the three row-taps
    w3 = w.astype(x.dtype).transpose(1, 0, 2, 3).reshape(3, 3 * cin, cout)
    operands = [x, a3, b3, w3, bias2.astype(jnp.float32)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, bh, width, cout), tile))
        operands.append(residual)

    y, s1, s2 = pl.pallas_call(
        functools.partial(
            _kernel, n_h=n_h, bh=bh, width=width, cin=cin, cout=cout,
            total=total, has_res=residual is not None,
            out_dtype=x.dtype),
        grid=(total,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bh, width, cout), tile),
            pl.BlockSpec((1, 1, cout), per_b),
            pl.BlockSpec((1, 1, cout), per_b),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, width, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, width + 16, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    return y, s1[:, 0, :], s2[:, 0, :]


def _reference(x, a, b, w, bias, residual):
    """XLA formulation with the kernel's exact math (f32 affine/silu/accum)."""
    actf = (x.astype(jnp.float32) * a[:, None, None, :].astype(jnp.float32)
            + b[:, None, None, :].astype(jnp.float32))
    act = actf * jax.nn.sigmoid(actf)
    y = jax.lax.conv_general_dilated(
        act, w.astype(jnp.float32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = (y + bias.astype(jnp.float32)).astype(x.dtype)
    if residual is not None:
        y = y + residual
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2))
    s2 = jnp.sum(jnp.square(yf), axis=(1, 2))
    return y, s1, s2


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gn_silu_conv(x, a, b, w, bias, residual, interpret):
    return _fwd_pallas(x, a, b, w, bias, residual, interpret)


def _gn_silu_conv_fwd(x, a, b, w, bias, residual, interpret):
    out = _fwd_pallas(x, a, b, w, bias, residual, interpret)
    return out, (x, a, b, w, bias, residual)


def _gn_silu_conv_bwd(interpret, saved, g):
    x, a, b, w, bias, residual = saved
    if residual is None:
        _, vjp = jax.vjp(
            lambda x, a, b, w, bias: _reference(x, a, b, w, bias, None),
            x, a, b, w, bias)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_reference, x, a, b, w, bias, residual)
    return vjp(g)


_gn_silu_conv.defvjp(_gn_silu_conv_fwd, _gn_silu_conv_bwd)


def gn_silu_conv3x3(
    x: jax.Array,
    a: jax.Array,
    b: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    *,
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """conv3x3(silu(x * a + b)) + bias (+ residual), plus per-channel
    f32 (sum, sum_sq) of the output for the next GroupNorm in the chain.

    a, b: (B, C) per-channel affine (GN statistics folded with scale/bias,
    see `gn_affine`).  Returns (y, s1, s2) with s1/s2 of shape (B, Cout).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _reference(x, a, b, w, bias, residual)
    interpret = jax.default_backend() != "tpu"
    return _gn_silu_conv(x, a, b, w, bias, residual, interpret)


def gn_affine(s1, s2, scale, bias, *, groups: int, n: int, eps: float):
    """Fold GN statistics (per-channel f32 sums over n elements/group) with
    the learned scale/bias into a per-(B, C) affine: y = x * a + b."""
    bsz, c = s1.shape
    s1g = s1.reshape(bsz, groups, -1).sum(-1)
    s2g = s2.reshape(bsz, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    sf = scale.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    a = inv_c * sf[None]
    b = bf[None] - mean_c * inv_c * sf[None]
    return a, b


def gn_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-channel f32 (sum, sum_sq) over spatial dims — chain seed at the
    seams (after conv_in / downsample / upsample / attention) where no
    megakernel produced stats.  Plain XLA reduce: its input is a pallas
    output (default layout), so no conv-layout entanglement arises."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(1, 2)), jnp.sum(jnp.square(xf), axis=(1, 2))


def fused_resnet_block(
    p,
    x: jax.Array,
    in_stats: Optional[Tuple[jax.Array, jax.Array]],
    *,
    groups: int,
    eps: float,
    impl: str = "auto",
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """diffusers ResnetBlock2D (no temb) as two megakernel calls with
    GroupNorm statistics threaded through.  Returns (out, out_stats);
    feed out_stats to the next block's `in_stats` while the chain is
    unbroken (any other op consuming the tensor in between invalidates)."""
    from diffews_tpu.models import layers as L

    bsz, h, width, cin = x.shape
    cout = p["conv1"]["kernel"].shape[-1]
    if in_stats is None:
        in_stats = gn_stats(x)
    a1, b1 = gn_affine(*in_stats, p["norm1"]["scale"], p["norm1"]["bias"],
                       groups=groups, n=h * width * (cin // groups), eps=eps)
    hmid, t1, t2 = gn_silu_conv3x3(
        x, a1, b1, p["conv1"]["kernel"], p["conv1"]["bias"], impl=impl)
    a2, b2 = gn_affine(t1, t2, p["norm2"]["scale"], p["norm2"]["bias"],
                       groups=groups, n=h * width * (cout // groups), eps=eps)
    res = x
    if "conv_shortcut" in p:
        res = L.conv2d(p["conv_shortcut"], x, padding=0)
    out, s1, s2 = gn_silu_conv3x3(
        hmid, a2, b2, p["conv2"]["kernel"], p["conv2"]["bias"], res,
        impl=impl)
    return out, (s1, s2)


def fused_norm_conv_out(p_norm, p_conv, x, in_stats, *, groups, eps,
                        impl: str = "auto"):
    """conv_out(silu(group_norm(x))) — the VAE head — as one megakernel."""
    bsz, h, width, c = x.shape
    if in_stats is None:
        in_stats = gn_stats(x)
    a, b = gn_affine(*in_stats, p_norm["scale"], p_norm["bias"],
                     groups=groups, n=h * width * (c // groups), eps=eps)
    y, _, _ = gn_silu_conv3x3(x, a, b, p_conv["kernel"], p_conv["bias"],
                              impl=impl)
    return y
