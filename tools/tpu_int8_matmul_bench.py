"""Is an int8 MATMUL ~2x bf16 at the UNet transformer shapes?

The joint UNet pass is ~135 ms of the b8 episode and its 64^2-resolution
transformer blocks dominate; after the flash fix the remaining time is
largely the QKV/out projections and GEGLU FFNs — plain matmuls.  Before
quantizing UNet linears (W8A8 like the VAE convs, ops/quant.py), measure
the primitive including the dequant/requant chain, at the dominant
(tokens x din x dout) shapes:

  - attn1 qkv proj:   (16*4096) x 320 x 320   (joint ref+tag streams, b8)
  - geglu up:         (16*4096) x 320 x 2560
  - geglu down:       (16*4096) x 1280 x 320
  - mid-res ffn:      (16*1024) x 640 x 5120

Chains ITERS matmuls inside one jit and host-reads a scalar (honest sync
through the axon tunnel, CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

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
    shapes = [
        (16 * 4096, 320, 320),
        (16 * 4096, 320, 2560),
        (16 * 4096, 1280, 320),
        (16 * 1024, 640, 5120),
    ]
    for (m, kdim, n) in shapes:
        # Chain as an (up, down) projection PAIR so every shape round-trips
        # to the carry (the original single-matmul chain broke the scan
        # carry whenever n < kdim); each iter counts both matmuls.
        x = jnp.asarray(rng.normal(size=(m, kdim)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(kdim, n)) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(n, kdim)) * 0.02, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(rng.normal(size=(m, kdim)) * 40, -127, 127),
                         jnp.int8)
        w8 = jnp.asarray(np.clip(rng.normal(size=(kdim, n)) * 40, -127, 127),
                         jnp.int8)
        w28 = jnp.asarray(np.clip(rng.normal(size=(n, kdim)) * 40, -127, 127),
                          jnp.int8)
        wscale = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)
        w2scale = jnp.asarray(rng.uniform(0.001, 0.01, (kdim,)), jnp.float32)
        flops = 2 * (2 * m * kdim * n) * ITERS

        def run_bf16(x, w, w2):
            def body(c, _):
                o = jnp.dot(c, w, preferred_element_type=jnp.float32)
                o = jnp.dot(o.astype(jnp.bfloat16), w2,
                            preferred_element_type=jnp.float32)
                return o.astype(jnp.bfloat16), None
            o, _ = jax.lax.scan(body, x, None, length=ITERS)
            return o.astype(jnp.float32).sum()

        def requant(o, scale):
            deq = o.astype(jnp.float32) * scale * (1.0 / 127.0)
            return jnp.clip(jnp.round(deq * 127.0), -127, 127).astype(jnp.int8)

        def run_int8(x8, w8, w28, wscale, w2scale):
            def body(c, _):
                o = requant(jnp.dot(c, w8, preferred_element_type=jnp.int32),
                            wscale)
                o = requant(jnp.dot(o, w28, preferred_element_type=jnp.int32),
                            w2scale)
                return o, None
            o, _ = jax.lax.scan(body, x8, None, length=ITERS)
            return o.astype(jnp.float32).sum()

        t_bf = timeit(jax.jit(run_bf16), x, w, w2) / ITERS
        t_i8 = timeit(jax.jit(run_int8), x8, w8, w28, wscale, w2scale) / ITERS
        print(f"{m}x{kdim}x{n} (pair): bf16 {t_bf*1e3:7.2f} ms "
              f"{flops/ITERS/t_bf/1e12:6.1f} TF/s | "
              f"int8 {t_i8*1e3:7.2f} ms {flops/ITERS/t_i8/1e12:6.1f} TOP/s "
              f"| speedup {t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
