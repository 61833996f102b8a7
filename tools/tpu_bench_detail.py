"""Detailed single-chip episode benchmark (xla vs pallas attention, b1/b8).

Run on the TPU host: `python tools/tpu_bench_detail.py`.  Uses honest tunnel
synchronization (scalar-reduction host reads).  Params are jit arguments.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.scheduler import DDIMScheduler

ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
sched = DDIMScheduler(SchedulerConfig.diffews())
sched.set_timesteps(1)
dt = jnp.bfloat16


@partial(jax.jit, static_argnames=("attn_impl",))
def predict(up, vp, q, sup, msk, ctx, attn_impl="xla"):
    b, n = sup.shape[0], sup.shape[1]
    flat = jnp.concatenate(
        [q, sup.reshape((b * n,) + sup.shape[2:]),
         msk.reshape((b * n,) + msk.shape[2:])], 0)
    lat = vae.encode_mean_latent(vp, vcfg, flat)
    lh, lw = lat.shape[1:3]
    ref = jnp.concatenate(
        [lat[b:b + b * n].reshape(b, n, lh, lw, -1),
         lat[b + b * n:].reshape(b, n, lh, lw, -1)], -1)
    v = unet.forward(up, ucfg, lat[:b], 1, ctx, ref_sample=ref, attn_impl=attn_impl)
    x0 = sched.step(v, 1, lat[:b]).pred_original_sample
    img = vae.decode(vp, vcfg, x0)
    img = jnp.clip(jnp.clip(img.astype(jnp.float32), -1, 1) * 127.5 + 127.5,
                   0, 255).astype(jnp.uint8)
    return img.astype(jnp.int32).sum()


def mk(b, seed):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.uniform(-1, 1, (b, 512, 512, 3)), dt),
            jnp.asarray(r.uniform(-1, 1, (b, 1, 512, 512, 3)), dt),
            jnp.asarray(r.uniform(-1, 1, (b, 1, 512, 512, 3)), dt),
            jnp.asarray(r.normal(size=(b, 2, 1024)), dt))


def main():
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    up = jax.tree_util.tree_map(lambda x: x.astype(dt), up)
    vp = jax.tree_util.tree_map(lambda x: x.astype(dt), vp)
    print("params ready", flush=True)

    for impl in ("xla", "pallas"):
        for b in (1, 8):
            t0 = time.time()
            try:
                int(predict(up, vp, *mk(b, 0), attn_impl=impl))
            except Exception as e:
                print(f"{impl} b{b} FAILED: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
                break
            print(f"{impl} b{b} compile+first: {time.time() - t0:.1f}s", flush=True)
            ts = []
            for i in range(3):
                inp = mk(b, i + 1)
                t0 = time.perf_counter()
                int(predict(up, vp, *inp, attn_impl=impl))
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"{impl} b{b}: {best * 1e3:.0f} ms -> {b / best:.2f} q/s", flush=True)


if __name__ == "__main__":
    main()
