"""Is an int8 conv actually ~2x bf16 on v5e through XLA?

v5e's MXU runs int8 at 394 TOPS vs 197 TF/s bf16. Before building an
int8-quantized VAE path (per-channel weight scales + static activation
scales), measure the primitive: 3x3 same-padding conv at the VAE's
dominant shapes, int8 x int8 -> int32 vs bf16 x bf16 -> f32, including
the dequant+requant elementwise chain an inference layer would pay
(scale multiply + clip + round + cast — should fuse into the conv's
epilogue / the next op's prologue).

Chains ITERS convs inside one jit and host-reads a scalar (honest sync
through the axon tunnel, CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 8
DN = ("NHWC", "HWIO", "NHWC")


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
        (8, 512, 512, 128, 128),   # VAE 512^2 stage (encode b8: 24 imgs -> use 8)
        (24, 256, 256, 256, 256),  # 256^2 stage at encode's 3B batch
        (8, 128, 128, 512, 512),
    ]
    for (b, hh, ww, cin, cout) in shapes:
        x = jnp.asarray(rng.normal(size=(b, hh, ww, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        x8 = jnp.asarray(
            np.clip(rng.normal(size=(b, hh, ww, cin)) * 40, -127, 127), jnp.int8)
        w8 = jnp.asarray(
            np.clip(rng.normal(size=(3, 3, cin, cout)) * 40, -127, 127), jnp.int8)
        wscale = jnp.asarray(rng.uniform(0.001, 0.01, (cout,)), jnp.float32)
        flops = 2 * 9 * b * hh * ww * cin * cout * ITERS

        def run_bf16(x, w):
            def body(c, _):
                o = jax.lax.conv_general_dilated(
                    c, w, (1, 1), "SAME", dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
                return o[..., :cin].astype(jnp.bfloat16), None
            o, _ = jax.lax.scan(body, x, None, length=ITERS)
            return o.astype(jnp.float32).sum()

        def run_int8(x8, w8, wscale):
            def body(c, _):
                o = jax.lax.conv_general_dilated(
                    c, w8, (1, 1), "SAME", dimension_numbers=DN,
                    preferred_element_type=jnp.int32)
                # inference dequant -> (stand-in for GN/SiLU) -> requant
                deq = o.astype(jnp.float32) * wscale * (1.0 / 127.0)
                re = jnp.clip(jnp.round(deq * 127.0), -127, 127)
                return re[..., :cin].astype(jnp.int8), None
            o, _ = jax.lax.scan(body, x8, None, length=ITERS)
            return o.astype(jnp.float32).sum()

        t_bf = timeit(jax.jit(run_bf16), x, w) / ITERS
        t_i8 = timeit(jax.jit(run_int8), x8, w8, wscale) / ITERS
        print(f"b{b} {hh}x{ww} {cin}->{cout}: "
              f"bf16 {t_bf*1e3:7.2f} ms {flops/ITERS/t_bf/1e12:6.1f} TF/s | "
              f"int8 {t_i8*1e3:7.2f} ms {flops/ITERS/t_i8/1e12:6.1f} TOP/s | "
              f"speedup {t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
