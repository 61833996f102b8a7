"""Pallas TPU stride-2 3x3 downsample conv (VAE encoder Downsample2D).

Why: XLA's native stride-2 conv emitter ("EmitAllBatchInSublanes") runs the
VAE encoder's three downsample convs at only 37-66 TF/s on v5e while the
surrounding stride-1 convs hit ~190 TF/s — ~28 ms of a saturated b24
512px encode (`tools/tpu_profile_episode.py`).  Every XLA-level
reformulation loses even harder (space-to-depth 2.4x worse — full-res
pad/transpose; stride-1+slice 22 TF/s; 9-tap strided-slice matmuls 5 TF/s:
the stride-2 W slices force relayouts; `tools/tpu_downsample_bench.py`).

The kernel sidesteps strided access entirely with a free HBM reinterpret:
`(B, H, W, C) -> (B, H, W/2, 2C)` puts the two COLUMN phases side by side
on the lane dim, so phase selection is a 128-aligned lane slice (free);
the two ROW phases are slices of the untiled leading dim of the VMEM tile
(free); and the shifted tap column (kx=2 needs phase-0 col c+1) is a
PRECOMPUTED second input `xs` (one XLA strided-slice+pad copy) DMA'd
alongside.  In-kernel alternatives all fail on v5e (measured 2026-08-17):
a pair-column-offset-1 DMA violates Mosaic's 8-aligned sublane windows,
`pltpu.roll` of the dot partial (the fused-resnet trick) deadlocks the
chip on this grid, and `jnp.roll` miscompiles.  The 3x3 stride-2 conv
then becomes ONE MXU matmul per tile:

    (bh*W2p, 9C) @ (9C, Cout)   # all nine taps lane-concatenated

with double-buffered halo DMA (each output-row tile needs input rows
2r..2r+2bh; the one-row bottom halo is the next tile's first row).  No
norm/activation stages — unlike the fused resnet chain this kernel is
nearly pure MXU.

Asymmetric (0,1),(0,1) padding only (diffusers VAE `Downsample2D`
semantics, `models/layers.py::downsample2d`); the UNet's symmetric-pad
downsample keeps the XLA path (it is not a measured bottleneck there).

Differentiation: `custom_vjp` whose backward is `jax.vjp` of the XLA
reference formulation (the VAE is frozen in DiffewS training,
`train_tools/train_icl_*_v3.py:1103-1104`).

MEASURED DEAD END (1x v5e, 2026-08-17; kept for the record + CPU
interpret tests, but "auto" resolves to the NATIVE XLA conv): at the
dominant B24 512^2 C128 shape the kernel runs 25.6-26.1 ms (17.7-18.1
TF/s) vs the native emitter's 12.9 ms (36 TF/s), and the time is
INVARIANT to every controllable knob — one 9C-concat dot vs six
separate dots vs a dots-only ablation (25.7/25.8/25.7 ms), bh=8/768
tiles vs bh=16/384 tiles at a raised 48 MB VMEM budget (25.8/26.1 ms),
and padded row-strided vs fully contiguous DMA windows (w2p=w2+8 vs
w2: 25.8/25.7 ms).  The bound is the HBM-side operand restructuring
the phase trick requires: under TPU tiled layouts the
(B,H,W,C)->(B,H,W/2,2C) "free reinterpret" and the shifted-tap copy
`xs` are BOTH physical relayout copies (~2.4 GB of extra traffic at
this shape), and they + the kernel's own 1.5x-input DMA exceed what
the native emitter's single strided pass pays even at its poor 36
TF/s.  Smaller shapes narrow but never flip: C256 31 vs ~48, C512 44
vs ~66 TF/s.  tools/tpu_downsample_bench.py reproduces the comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 << 20


def _pick_bh(h2: int, w2p: int, cin: int, cout: int, esize: int = 2) -> int:
    """Largest divisor of h2 (output rows per tile) within the VMEM budget."""
    best = 1
    for bh in range(1, h2 + 1):
        if h2 % bh:
            continue
        rows = 2 * bh + 2
        need = (2 * rows * w2p * 3 * cin * esize        # slots + shift copies
                + 9 * cin * cout * esize                # weights
                + 2 * bh * w2p * cout * 4               # f32 acc
                + bh * w2p * cout * esize)              # y block
        if need <= _VMEM_BUDGET:
            best = bh
        if bh * w2p >= 4096 and best >= 8:
            break
    return best


def _kernel(x_hbm, xs_hbm, wm_ref, bias_ref, y_ref, slots, shifts, sems,
            *, n_h, bh, w2, w2p, cin, cout, total, out_dtype):
    idx = pl.program_id(0)

    # slots: both column phases, pair columns 0..w2-1 ([x(2c) | x(2c+1)]).
    # shifts: the precomputed shifted operand xs (x(2c+2) aligned under
    # output column c) — the kx=2 tap; see module docstring for why the
    # in-kernel alternatives (rolls, offset DMAs) are unusable.
    def _center(slot, b_, j_):
        return pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(j_ * 2 * bh, 2 * bh)],
            slots.at[slot, pl.ds(0, 2 * bh), pl.ds(0, w2)],
            sems.at[slot, 0])

    def _halo(slot, b_, j_):
        return pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds((j_ + 1) * 2 * bh, 1)],
            slots.at[slot, pl.ds(2 * bh, 1), pl.ds(0, w2)],
            sems.at[slot, 1])

    def _center_s(slot, b_, j_):
        return pltpu.make_async_copy(
            xs_hbm.at[b_, pl.ds(j_ * 2 * bh, 2 * bh)],
            shifts.at[slot, pl.ds(0, 2 * bh), pl.ds(0, w2)],
            sems.at[slot, 2])

    def _halo_s(slot, b_, j_):
        return pltpu.make_async_copy(
            xs_hbm.at[b_, pl.ds((j_ + 1) * 2 * bh, 1)],
            shifts.at[slot, pl.ds(2 * bh, 1), pl.ds(0, w2)],
            sems.at[slot, 3])

    def _start(i):
        slot = jax.lax.rem(i, 2)
        b_ = i // n_h
        j_ = i - b_ * n_h
        _center(slot, b_, j_).start()
        _center_s(slot, b_, j_).start()

        @pl.when(j_ < n_h - 1)
        def _():
            _halo(slot, b_, j_).start()
            _halo_s(slot, b_, j_).start()

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
    _center_s(slot, b_i, j).wait()

    @pl.when(j < n_h - 1)
    def _():
        _halo(slot, b_i, j).wait()
        _halo_s(slot, b_i, j).wait()

    # bottom image row = conv zero pad: never DMA'd, zero it (row stores on
    # the untiled dim are alignment-free).  Sublane PAD columns >= w2 need
    # no zeroing — each output column reads only its own pair/shift column,
    # so garbage there lands exclusively in the discarded out cols >= w2.
    @pl.when(j == n_h - 1)
    def _():
        slots[slot, 2 * bh:2 * bh + 1, :, :] = jnp.zeros(
            (1, w2p, 2 * cin), slots.dtype)
        shifts[slot, 2 * bh:2 * bh + 1, :, :] = jnp.zeros(
            (1, w2p, cin), shifts.dtype)

    # Row phases via a free reshape of the untiled leading dim (Mosaic has
    # no 3D strided slice/gather): rows (2bh+2) -> (bh+1, 2); the trailing
    # pad row bh+1,phase1 is never read.
    t = slots[slot].reshape(bh + 1, 2, w2p, 2 * cin)
    r0 = t[0:bh, 0]                       # input rows 2r     (bh, W2p, 2C)
    r1 = t[0:bh, 1]                       # input rows 2r+1
    r2 = t[1:bh + 1, 0]                   # input rows 2r+2
    ts = shifts[slot].reshape(bh + 1, 2, w2p, cin)
    s0 = ts[0:bh, 0]                      # x[2r,   2c+2]     (bh, W2p, C)
    s1 = ts[0:bh, 1]                      # x[2r+1, 2c+2]
    s2 = ts[1:bh + 1, 0]                  # x[2r+2, 2c+2]
    # one (bh*W2p, 9C) @ (9C, Cout) MXU dot: kx in {0,1} from both phases
    # of the pair tile, kx=2 from the shifted copy
    patch = jnp.concatenate([r0, r1, r2, s0, s1, s2], axis=-1)
    patch = patch.reshape(bh * w2p, 9 * cin)
    acc = jnp.dot(patch, wm_ref[:], preferred_element_type=jnp.float32)
    acc = acc.reshape(bh, w2p, cout) + bias_ref[0].astype(jnp.float32)
    y_ref[0] = acc[:, 0:w2, :].astype(out_dtype)


def _xla_reference(x, w, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def _fwd_pallas(x, w, bias, interpret=False):
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0 and width % 2 == 0, (h, width)
    h2, w2 = h // 2, width // 2
    w2p = w2 + 8
    x2 = x.reshape(bsz, h, w2, 2 * cin)   # free reinterpret (row-major)
    # shifted kx=2 operand: xs[., c, :] = x[., 2c+2] (zero at 2c+2 == W).
    # One XLA strided-slice+pad copy (~1.5x input bytes of extra HBM
    # traffic); in-kernel alternatives are unusable: offset-1 DMAs violate
    # Mosaic's 8-aligned sublane windows, pltpu.roll of the dot partial
    # deadlocks the chip, and jnp.roll miscompiles (all measured
    # 2026-08-17, see PERF.md).
    xs = jnp.pad(x2[:, :, 1:, :cin], ((0, 0), (0, 0), (0, 1), (0, 0)))

    # patch lane order: [r0 2C | r1 2C | r2 2C | s0 C | s1 C | s2 C]
    wm = jnp.concatenate(
        [w[0, 0], w[0, 1], w[1, 0], w[1, 1], w[2, 0], w[2, 1],
         w[0, 2], w[1, 2], w[2, 2]], axis=0)   # (9C, Cout)

    bh = _pick_bh(h2, w2p, cin, cout, x.dtype.itemsize)
    n_h = h2 // bh
    total = bsz * n_h

    kernel = functools.partial(
        _kernel, n_h=n_h, bh=bh, w2=w2, w2p=w2p, cin=cin, cout=cout,
        total=total, out_dtype=x.dtype)
    y = pl.pallas_call(
        kernel,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w2, cout),
                               lambda i: (i // n_h, i % n_h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h2, w2, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * bh + 2, w2p, 2 * cin), x.dtype),
            pltpu.VMEM((2, 2 * bh + 2, w2p, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, xs, wm, bias.reshape(1, cout))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def downsample_conv2x(x, w, bias, impl: str = "auto"):
    """3x3 stride-2 conv with (0,1),(0,1) padding, NHWC/HWIO.

    impl: "auto" (= xla everywhere — the pallas kernel measurably LOSES
    to the native emitter, see module docstring) | "pallas" | "xla" |
    "interpret" (pallas interpreter, for CPU tests).
    """
    if impl == "auto":
        impl = "xla"
    if impl == "xla":
        return _xla_reference(x, w, bias)
    return _fwd_pallas(x, w, bias, interpret=(impl == "interpret"))


def _vjp_fwd(x, w, bias, impl):
    return downsample_conv2x(x, w, bias, impl), (x, w, bias)


def _vjp_bwd(impl, res, g):
    x, w, bias = res
    _, pull = jax.vjp(_xla_reference, x, w, bias)
    return pull(g)


downsample_conv2x.defvjp(_vjp_fwd, _vjp_bwd)
