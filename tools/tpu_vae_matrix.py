"""VAE encode/decode timing matrix: {GN xla,pallas} x {mid-attn xla,pallas}."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import VAEConfig
from diffews_tpu.models import vae
from diffews_tpu.ops import groupnorm as gn_mod

dt = jnp.bfloat16
vcfg = VAEConfig.sd()


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    f0 = jax.jit(lambda x: x.astype(jnp.float32).sum())
    rt = timeit(f0, jnp.zeros((8, 128), dt))
    print(f"RT {rt*1e3:.1f} ms", flush=True)

    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    vp = jax.tree_util.tree_map(lambda a: a.astype(dt), vp)

    orig = gn_mod.group_norm_act

    for gn_impl in ("xla", "pallas"):
        def forced(params, x, *, groups, eps, act=None, impl="auto",
                   _g=gn_impl):
            return orig(params, x, groups=groups, eps=eps, act=act, impl=_g)
        gn_mod.group_norm_act = forced
        for attn in ("xla", "pallas"):
            enc = jax.jit(lambda vp, x, a=attn: vae.encode_mean_latent(
                vp, vcfg, x, attn_impl=a).astype(jnp.float32).sum())
            dec = jax.jit(lambda vp, z, a=attn: vae.decode(
                vp, vcfg, z, attn_impl=a).astype(jnp.float32).sum())
            for nb in (3, 24):
                r = np.random.default_rng(0)
                imgs = jnp.asarray(r.uniform(-1, 1, (nb, 512, 512, 3)), dt)
                t = timeit(enc, vp, imgs) - rt
                print(f"encode gn={gn_impl:6s} attn={attn:6s} b{nb:2d}: "
                      f"{t*1e3:7.1f} ms", flush=True)
            r = np.random.default_rng(0)
            z = jnp.asarray(r.normal(size=(1, 64, 64, 4)) * 0.2, dt)
            t = timeit(dec, vp, z) - rt
            print(f"decode gn={gn_impl:6s} attn={attn:6s} b 1: "
                  f"{t*1e3:7.1f} ms", flush=True)
    gn_mod.group_norm_act = orig


if __name__ == "__main__":
    main()
