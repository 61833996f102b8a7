"""Microbenchmark: VAE-encoder conv shapes on the TPU, achieved TFLOP/s.

Locates where the VAE encode time goes (BASELINE.md throughput lever): each
row times ONE op shape in isolation (jit + honest host-read sync) and prints
achieved TFLOP/s vs the v5e bf16 peak (~197).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.models import layers as L

dt = jnp.bfloat16
PEAK = 197.0  # v5e bf16 TFLOP/s


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def conv_row(name, b, hw, cin, cout, k=3, stride=1, dtype=dt):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (b, hw, hw, cin)), dtype)
    p = {"kernel": jnp.asarray(r.normal(size=(k, k, cin, cout)) * 0.02, dtype),
         "bias": jnp.zeros((cout,), dtype)}
    f = jax.jit(lambda p, x: L.conv2d(p, x, stride=stride, padding=k // 2)
                .astype(jnp.float32).sum())
    t = timeit(f, p, x)
    flops = 2 * b * (hw // stride) ** 2 * cin * cout * k * k
    print(f"{name:42s} {t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TF/s "
          f"({100 * flops / t / 1e12 / PEAK:4.1f}% peak)", flush=True)


def resnet_row(name, b, hw, c):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (b, hw, hw, c)), dt)
    p = {
        "norm1": {"scale": jnp.ones((c,), dt), "bias": jnp.zeros((c,), dt)},
        "conv1": {"kernel": jnp.asarray(r.normal(size=(3, 3, c, c)) * 0.02, dt),
                  "bias": jnp.zeros((c,), dt)},
        "norm2": {"scale": jnp.ones((c,), dt), "bias": jnp.zeros((c,), dt)},
        "conv2": {"kernel": jnp.asarray(r.normal(size=(3, 3, c, c)) * 0.02, dt),
                  "bias": jnp.zeros((c,), dt)},
    }
    f = jax.jit(lambda p, x: L.resnet_block(p, x, None, groups=32, eps=1e-6)
                .astype(jnp.float32).sum())
    t = timeit(f, p, x)
    flops = 2 * 2 * b * hw * hw * c * c * 9
    print(f"{name:42s} {t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TF/s "
          f"({100 * flops / t / 1e12 / PEAK:4.1f}% peak, conv flops only)",
          flush=True)


def matmul_row(name, m, k, n):
    r = np.random.default_rng(0)
    a = jnp.asarray(r.normal(size=(m, k)) * 0.02, dt)
    b_ = jnp.asarray(r.normal(size=(k, n)) * 0.02, dt)
    f = jax.jit(lambda a, b: jnp.dot(a, b).astype(jnp.float32).sum())
    t = timeit(f, a, b_)
    flops = 2 * m * k * n
    print(f"{name:42s} {t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TF/s "
          f"({100 * flops / t / 1e12 / PEAK:4.1f}% peak)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    b = 3  # 3 VAE streams at episode bsz 1

    # MXU sanity ceiling
    matmul_row("matmul 8192x8192x8192 bf16", 8192, 8192, 8192)

    # encoder block-0 shapes (512px input)
    conv_row("conv 512^2 3->128 (conv_in)", b, 512, 3, 128)
    conv_row("conv 512^2 128->128", b, 512, 128, 128)
    conv_row("conv 512^2 128->128 s2 (down0)", b, 512, 128, 128, stride=2)
    # block-1/2/3 shapes
    conv_row("conv 256^2 128->256", b, 256, 128, 256)
    conv_row("conv 256^2 256->256", b, 256, 256, 256)
    conv_row("conv 128^2 256->512", b, 128, 256, 512)
    conv_row("conv 128^2 512->512", b, 128, 512, 512)
    conv_row("conv  64^2 512->512", b, 64, 512, 512)

    # batched episode (bsz 8 -> 24 images)
    conv_row("conv 512^2 128->128 b24", 24, 512, 128, 128)
    conv_row("conv 256^2 256->256 b24", 24, 256, 256, 256)

    # fused resnet block (GN+SiLU+conv x2 + add)
    resnet_row("resnet 512^2 c128", b, 512, 128)
    resnet_row("resnet 256^2 c256", b, 256, 256)

    # fp32 comparison for the hot shape
    conv_row("conv 512^2 128->128 fp32", b, 512, 128, 128, dtype=jnp.float32)


if __name__ == "__main__":
    main()
