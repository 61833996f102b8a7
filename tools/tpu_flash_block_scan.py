"""Flash-attention block-size scan at the joint UNet's dominant shapes.

attn1 at the 64^2 x 320 stage is ~100 ms of the 189 ms b8 joint UNet pass
(tools/tpu_unet_stage_attr.py); the kernel runs ~53 TF/s vs the ~98 TF/s
f32-dot MXU ceiling at head_dim 64.  Scans (block_q, block_k) for the two
shapes that matter: tag rows (sq 4096, kv 8192) and ref rows (4096, 4096),
b = 8 episode streams x 5 heads.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.ops.flash_attention import flash_attention

dt = jnp.bfloat16
ITERS = 8


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for (sq, skv) in [(4096, 8192), (4096, 4096)]:
        b, h, d = 8, 5, 64
        q = jnp.asarray(rng.normal(size=(b, sq, h, d)), dt)
        k = jnp.asarray(rng.normal(size=(b, skv, h, d)), dt)
        v = jnp.asarray(rng.normal(size=(b, skv, h, d)), dt)
        flops = 2 * 2 * b * h * sq * skv * d * ITERS
        if "avdot" in sys.argv:
            # A/B the bf16 p@v dot at the current best blocks
            import diffews_tpu.ops.flash_attention as FA
            FA.AV_BF16 = True
            grid_pairs = [(512, 2048), (1024, 2048), (512, 1024)]
        elif "ext" in sys.argv:
            # single/two-block KV: no (or one) online-softmax rescale at all
            grid_pairs = [(128, 4096), (256, 4096), (512, 4096),
                          (128, 8192), (256, 8192), (64, 8192)]
        else:
            grid_pairs = [(bq, bk) for bq in (256, 512, 1024, 2048)
                          for bk in (256, 512, 1024, 2048)]
        for bq, bk in grid_pairs:
                if bq > sq or bk > skv:
                    continue

                def run(q, k, v, bq=bq, bk=bk):
                    def body(c, _):
                        o = flash_attention(c, k, v, block_q=bq, block_k=bk)
                        return o.astype(dt), None
                    o, _ = jax.lax.scan(body, q, None, length=ITERS)
                    return o.astype(jnp.float32).sum()

                try:
                    t = timeit(jax.jit(run), q, k, v) / ITERS
                except Exception as e:
                    print(f"sq{sq} kv{skv} bq{bq:4d} bk{bk:4d}: FAIL "
                          f"{type(e).__name__}", flush=True)
                    continue
                print(f"sq{sq} kv{skv} bq{bq:4d} bk{bk:4d}: {t*1e3:7.2f} ms "
                      f"{flops/ITERS/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
