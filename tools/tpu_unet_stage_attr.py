"""Attribute UNet forward time to stages at joint-pass shapes.

The b8 1-shot joint UNet forward (16 streams) runs at ~37% of v5e bf16
peak (tools/tpu_unet_microbench.py: 189 ms).  This tool times each block
type in isolation at the shapes the joint pass actually sees, to find
where the other 63% goes: resnet blocks (GN layout-copy suspects, like
the VAE at 512px), transformer blocks (attn+FF matmuls), up/downsamples.

Each row chains ITERS iterations inside one jit to amortize the ~25 ms
tunnel round-trip and reads a scalar (honest sync; see CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import layers as L, unet
from diffews_tpu.utils import init as I

dt = jnp.bfloat16
ITERS = 16
ucfg = UNetConfig.sd21()


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain(fn):
    def run(x, *rest):
        def body(h, _):
            return fn(h, *rest), None
        h, _ = jax.lax.scan(body, x, None, length=ITERS)
        return h.astype(jnp.float32).sum()
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    temb_dim = ucfg.block_out_channels[0] * 4  # 1280

    print(f"{'stage':44s} {'ms/iter':>8s} {'TF/s':>7s}", flush=True)

    B = 16  # joint streams at episode batch 8, 1-shot
    temb = jnp.asarray(rng.normal(size=(B, temb_dim)), dt)

    blocks = [] if "inside" in sys.argv else [(64, 320), (32, 640),
                                              (16, 1280), (8, 1280)]
    for (hw, c) in blocks:
        x = jnp.asarray(rng.normal(size=(B, hw, hw, c)), dt)
        p = unet._resnet_params(I.RngStream(key), c, c, temb_dim)
        p = jax.tree_util.tree_map(lambda a: a.astype(dt), p)
        f = chain(lambda h, pp, tt: L.resnet_block(pp, h, tt, groups=32, eps=1e-5))
        t = timeit(f, x, p, temb) / ITERS
        tf = 2 * 2 * B * hw * hw * c * c * 9 / t / 1e12  # 2 convs of 3x3
        print(f"resnet    {hw:3d}x{hw:<3d} c{c:<5d} b{B:<3d}"
              f"{'':14s} {t*1e3:8.2f} {tf:7.1f}", flush=True)

        # conv-only reference: 2 chained 3x3 convs, no GN/SiLU/temb
        pc = {"conv1": p["conv1"], "conv2": p["conv2"]}
        fc = chain(lambda h, pp: L.conv2d(pp["conv2"], L.conv2d(pp["conv1"], h)))
        tc = timeit(fc, x, pc) / ITERS
        tfc = 2 * 2 * B * hw * hw * c * c * 9 / tc / 1e12
        print(f"  2x conv3x3 only{'':28s} {tc*1e3:8.2f} {tfc:7.1f}", flush=True)

    # transformer2d blocks at joint shapes (ref stream: self-attn over own
    # tokens; tag stream: fused KV).  Use the real joint path via stream_info.
    ctx = jnp.asarray(rng.normal(size=(B, 2, ucfg.cross_attention_dim)), dt)
    for (hw, c) in ([] if "inside" in sys.argv else
                    [(64, 320), (32, 640), (16, 1280), (8, 1280)]):
        heads = c // 64
        x = jnp.asarray(rng.normal(size=(B, hw, hw, c)), dt)
        p = unet._transformer_params(I.RngStream(key), c, ucfg)
        p = jax.tree_util.tree_map(lambda a: a.astype(dt), p)
        stream_info = (8, 1, None, None)  # first 8 rows = support stream
        f = chain(lambda h, pp, cc: unet._transformer2d(
            pp, h, cc, heads=heads, cfg=ucfg, stream_info=stream_info,
            attn_impl="auto"))
        t = timeit(f, x, p, ctx) / ITERS
        s = hw * hw
        # matmul flops: qkv+out proj 4*s*c^2, attn 2*2*s*s*c (tag rows see 2s
        # keys), ff 2*s*c*8c (geglu 4c twice) -> per stream; x B streams
        flops = B * (4 * 2 * s * c * c + 2 * 2 * s * s * c * 2
                     + 2 * s * c * 8 * c + 2 * s * 4 * c * c)
        print(f"transformer {hw:3d}x{hw:<3d} c{c:<5d} b{B:<3d} (joint attn)"
              f"{'':6s} {t*1e3:8.2f} {flops/t/1e12:7.1f}", flush=True)

    # ---- inside the 64^2 transformer: attn1 / attn2 / ff in isolation ----
    hw, c = 64, 320
    heads = c // 64
    s = hw * hw
    h = jnp.asarray(rng.normal(size=(B, s, c)), dt)
    p = unet._transformer_params(I.RngStream(key), c, ucfg)
    p = jax.tree_util.tree_map(lambda a: a.astype(dt), p)
    blk = p["transformer_blocks"]["0"]

    f = chain(lambda x, pp: x + unet._attn1(
        pp["attn1"], L.layer_norm(pp["norm1"], x), heads=heads, ref_rows=8,
        n_shots=1, shot_mask=None, attn_impl="auto"))
    t = timeit(f, h, blk) / ITERS
    fl = B * (4 * 2 * s * c * c) + 8 * (2 * 2 * s * s * c) * 2 + 8 * (2 * 2 * s * s * c)
    print(f"  attn1 (joint flash + proj){'':18s} {t*1e3:8.2f} {fl/t/1e12:7.1f}",
          flush=True)

    f = chain(lambda x, pp, cc: x + unet._attn2(
        pp["attn2"], L.layer_norm(pp["norm2"], x), cc, heads=heads))
    t = timeit(f, h, blk, ctx) / ITERS
    print(f"  attn2 (cross, 2-token ctx){'':18s} {t*1e3:8.2f}", flush=True)

    f = chain(lambda x, pp: x + L.geglu_ff(pp["ff"], L.layer_norm(pp["norm3"], x)))
    t = timeit(f, h, blk) / ITERS
    fl = B * (2 * s * c * 8 * c + 2 * s * 4 * c * c)
    print(f"  geglu ff{'':36s} {t*1e3:8.2f} {fl/t/1e12:7.1f}", flush=True)

    # attn1 variants: tag-only (no ref rows) and xla dense, for reference
    f = chain(lambda x, pp: x + unet._attn1(
        pp["attn1"], L.layer_norm(pp["norm1"], x), heads=heads, ref_rows=None,
        n_shots=1, shot_mask=None, attn_impl="auto"))
    t = timeit(f, h, blk) / ITERS
    print(f"  attn1 plain self (no ref){'':19s} {t*1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
