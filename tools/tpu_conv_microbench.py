"""Microbenchmark: VAE-encoder conv shapes on the TPU, achieved TFLOP/s.

Methodology: the axon tunnel adds ~25 ms per host read, so single-op
timings are meaningless.  Each op is CHAINED x ITERS inside one jit (data
dependency prevents CSE/overlap tricks) and the per-iteration time is
(t_chain - t_rt) / ITERS with t_rt measured on an empty graph.
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
ITERS = 16


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


RT = None  # tunnel round-trip, measured once


def measure_rt():
    global RT
    x = jnp.zeros((8, 128), dt)
    f = jax.jit(lambda x: x.astype(jnp.float32).sum())
    RT = timeit(f, x)
    print(f"tunnel round-trip (empty graph): {RT * 1e3:.1f} ms", flush=True)


def report(name, t_chain, flops_per_iter, bytes_per_iter=None):
    t = max((t_chain - RT) / ITERS, 1e-9)
    line = f"{name:42s} {t * 1e3:7.2f} ms/iter"
    if flops_per_iter:
        tf = flops_per_iter / t / 1e12
        line += f"  {tf:6.1f} TF/s ({100 * tf / PEAK:4.1f}% peak)"
    if bytes_per_iter:
        line += f"  {bytes_per_iter / t / 1e9:6.0f} GB/s"
    print(line, flush=True)


def conv_row(name, b, hw, c, k=3, dtype=dt):
    """Chained c->c conv (cin==cout so x=f(x) chains)."""
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (b, hw, hw, c)), dtype)
    p = {"kernel": jnp.asarray(r.normal(size=(k, k, c, c)) * 0.05, dtype),
         "bias": jnp.zeros((c,), dtype)}

    def chain(p, x):
        for _ in range(ITERS):
            x = L.conv2d(p, x, padding=k // 2)
            x = jnp.tanh(x)  # keep values bounded; negligible cost
        return x.astype(jnp.float32).sum()

    t = timeit(jax.jit(chain), p, x)
    flops = 2 * b * hw * hw * c * c * k * k
    report(name, t, flops)


def gn_row(name, b, hw, c, groups=32):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (b, hw, hw, c)), dt)
    p = {"scale": jnp.ones((c,), dt), "bias": jnp.zeros((c,), dt)}

    def chain(p, x):
        for _ in range(ITERS):
            x = L.group_norm(p, x, groups=groups, eps=1e-6)
        return x.astype(jnp.float32).sum()

    t = timeit(jax.jit(chain), p, x)
    nbytes = x.size * x.dtype.itemsize
    report(name, t, None, bytes_per_iter=3 * nbytes)  # 2 reads + 1 write ideal


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

    def chain(p, x):
        for _ in range(ITERS):
            x = L.resnet_block(p, x, None, groups=32, eps=1e-6)
        return x.astype(jnp.float32).sum()

    t = timeit(jax.jit(chain), p, x)
    flops = 2 * 2 * b * hw * hw * c * c * 9
    report(name, t, flops)


def matmul_row(name, m, k, n):
    r = np.random.default_rng(0)
    a = jnp.asarray(r.normal(size=(m, k)) * 0.05, dt)
    b_ = jnp.asarray(r.normal(size=(k, n)) * 0.05, dt)

    def chain(a, b):
        x = a
        for _ in range(ITERS):
            x = jnp.tanh(jnp.dot(x, b))
        return x.astype(jnp.float32).sum()

    t = timeit(jax.jit(chain), a, b_)
    report(name, t, 2 * m * k * n)


def copy_row(name, b, hw, c):
    x = jnp.zeros((b, hw, hw, c), dt)

    def chain(x):
        for _ in range(ITERS):
            x = x * 1.0001 + 0.0001
        return x.astype(jnp.float32).sum()

    t = timeit(jax.jit(chain), x)
    nbytes = x.size * x.dtype.itemsize
    report(name, t, None, bytes_per_iter=2 * nbytes)


def main():
    print(f"devices: {jax.devices()}  ITERS={ITERS}", flush=True)
    measure_rt()
    b = 3  # 3 VAE streams at episode bsz 1

    matmul_row("matmul 8192^3 bf16 (MXU ceiling)", 8192, 8192, 8192)
    copy_row("elementwise 512^2x128 b3 (HBM ceiling)", b, 512, 128)

    conv_row("conv 512^2 c128 b3", b, 512, 128)
    conv_row("conv 256^2 c256 b3", b, 256, 256)
    conv_row("conv 128^2 c512 b3", b, 128, 512)
    conv_row("conv  64^2 c512 b3", b, 64, 512)
    conv_row("conv 512^2 c128 b24", 24, 512, 128)
    conv_row("conv 256^2 c256 b24", 24, 256, 256)

    gn_row("groupnorm 512^2 c128 b3", b, 512, 128)
    gn_row("groupnorm 256^2 c256 b3", b, 256, 256)

    resnet_row("resnet 512^2 c128 b3", b, 512, 128)
    resnet_row("resnet 256^2 c256 b3", b, 256, 256)


if __name__ == "__main__":
    main()
