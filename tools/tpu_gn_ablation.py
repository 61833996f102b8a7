"""Ablation: how much episode time goes to GroupNorm fp32 round-trips."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import layers as L
from diffews_tpu.models import unet, vae

ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
dt = jnp.bfloat16


def timeit(name, f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:.1f} ms", flush=True)


def main():
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    vp = jax.tree_util.tree_map(lambda x: x.astype(dt), vp)
    r = np.random.default_rng(0)
    imgs3 = jnp.asarray(r.uniform(-1, 1, (3, 512, 512, 3)), dt)

    enc = jax.jit(lambda vp, x: vae.encode_mean_latent(vp, vcfg, x)
                  .astype(jnp.float32).sum())
    timeit("encode x3 (gn fp32)", enc, vp, imgs3)

    # identity-GN ablation
    real_gn = L.group_norm
    L.group_norm = lambda p, x, *, groups, eps: x
    enc2 = jax.jit(lambda vp, x: vae.encode_mean_latent(vp, vcfg, x)
                   .astype(jnp.float32).sum())
    timeit("encode x3 (gn OFF) ", enc2, vp, imgs3)
    L.group_norm = real_gn

    # bf16-stats GN variant
    def gn_bf16(p, x, *, groups, eps):
        b = x.shape[0]
        c = x.shape[-1]
        g = x.reshape(b, -1, groups, c // groups)
        mean = jnp.mean(g, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(g.astype(jnp.float32)), axis=(1, 3), keepdims=True
        ) - jnp.square(mean)
        a = jax.lax.rsqrt(var + eps)
        y = (g.astype(jnp.float32) - mean) * a
        y = y.reshape(x.shape).astype(x.dtype)
        return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)

    L.group_norm = gn_bf16
    enc3 = jax.jit(lambda vp, x: vae.encode_mean_latent(vp, vcfg, x)
                   .astype(jnp.float32).sum())
    timeit("encode x3 (gn alt) ", enc3, vp, imgs3)
    L.group_norm = real_gn


if __name__ == "__main__":
    main()
