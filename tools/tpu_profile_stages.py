"""Per-stage timing of the episode graph on the TPU (honest sync).

Stages: VAE encode (3 streams), UNet joint forward, VAE decode — plus
variants (attention impl, ref-stream on/off) to locate the time.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae

ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
dt = jnp.bfloat16


@jax.jit
def enc(vp, imgs):
    return vae.encode_mean_latent(vp, vcfg, imgs).astype(jnp.float32).sum()


@jax.jit
def dec(vp, z):
    return vae.decode(vp, vcfg, z).astype(jnp.float32).sum()


@partial(jax.jit, static_argnames=("attn_impl", "with_ref"))
def unet_fwd(up, q_lat, ref, ctx, attn_impl="xla", with_ref=True):
    out = unet.forward(up, ucfg, q_lat, 1, ctx,
                       ref_sample=ref if with_ref else None, attn_impl=attn_impl)
    return out.astype(jnp.float32).sum()


def timeit(name, f, *args, reps=3):
    float(f(*args))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:.1f} ms", flush=True)


def main():
    b = 1
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    up = jax.tree_util.tree_map(lambda x: x.astype(dt), up)
    vp = jax.tree_util.tree_map(lambda x: x.astype(dt), vp)
    r = np.random.default_rng(0)
    imgs3 = jnp.asarray(r.uniform(-1, 1, (3 * b, 512, 512, 3)), dt)
    img1 = jnp.asarray(r.uniform(-1, 1, (b, 512, 512, 3)), dt)
    z = jnp.asarray(r.normal(size=(b, 64, 64, 4)), dt)
    q_lat = jnp.asarray(r.normal(size=(b, 64, 64, 4)), dt)
    ref = jnp.asarray(r.normal(size=(b, 1, 64, 64, 8)), dt)
    ctx = jnp.asarray(r.normal(size=(b, 2, 1024)), dt)
    print("ready", flush=True)

    timeit("vae encode x3 imgs", enc, vp, imgs3)
    timeit("vae encode x1 img ", enc, vp, img1)
    timeit("vae decode x1     ", dec, vp, z)
    timeit("unet joint (xla)  ", unet_fwd, up, q_lat, ref, ctx)
    timeit("unet plain (xla)  ", lambda up, q, c: unet_fwd(up, q, None, c, with_ref=False),
           up, q_lat, ctx)
    try:
        timeit("unet joint (pallas)", lambda up, q, rf, c: unet_fwd(up, q, rf, c, attn_impl="pallas"),
               up, q_lat, ref, ctx)
    except Exception as e:
        print("pallas failed:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
