"""Flash-attention BACKWARD A/B at the joint UNet's dominant shapes.

The forward's p@v dot gained ~5% from casting the computed f32
probabilities to bf16 against the native-bf16 v block (AV_BF16,
flash_attention.py:53-60).  The backward has three dots with the same
computed-x-loaded structure (dV += p^T.dO, dQ += ds.K, dK += ds^T.Q) and
2x the forward's FLOPs, so the same cast is worth an A/B (BWD_BF16).
Chains ITERS vjp calls inside one jit and host-reads a scalar so the
~25 ms tunnel round-trip amortizes and the sync is honest (CLAUDE.md).

Usage: python tools/tpu_flash_bwd_bench.py            # A/B on | off
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

import diffews_tpu.ops.flash_attention as FA

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
        # fwd 2 dots + bwd 5 dots at (sq, skv) each 2*b*h*sq*skv*d
        flops = 7 * 2 * b * h * sq * skv * d * ITERS

        for flag in (False, True):
            FA.BWD_BF16 = flag

            def run(q, k, v):
                def body(c, _):
                    def loss(t):
                        o = FA.flash_attention(t, k, v)
                        return (o.astype(jnp.float32) ** 2).sum()

                    g = jax.grad(loss)(c)
                    return (c + 1e-6 * g).astype(dt), None

                o, _ = jax.lax.scan(body, q, None, length=ITERS)
                return o.astype(jnp.float32).sum()

            t = timeit(jax.jit(run), q, k, v) / ITERS
            print(f"sq{sq} kv{skv} bwd_bf16={int(flag)}: {t*1e3:7.2f} ms "
                  f"{flops/ITERS/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
