"""UNet forward microbenchmark: chained iterations amortize the tunnel RT.

The UNet maps (B,64,64,4) -> (B,64,64,4), so x = unet(x) chains cleanly.
Rows: batch 1/8, with/without the support (ref) stream, xla/pallas attn.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import unet

ucfg = UNetConfig.sd21()
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
    f0 = jax.jit(lambda x: x.astype(jnp.float32).sum())
    rt = timeit(f0, jnp.zeros((8, 128), dt))
    print(f"RT {rt*1e3:.1f} ms  ITERS={ITERS}", flush=True)

    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    up = jax.tree_util.tree_map(lambda x: x.astype(dt), up)

    @partial(jax.jit, static_argnames=("attn_impl", "with_ref"))
    def chain(up, x, ref, ctx, attn_impl="pallas", with_ref=True):
        for _ in range(ITERS):
            x = unet.forward(up, ucfg, x, 1, ctx,
                             ref_sample=ref if with_ref else None,
                             attn_impl=attn_impl)
        return x.astype(jnp.float32).sum()

    for b in (1, 8):
        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(size=(b, 64, 64, 4)) * 0.2, dt)
        ref = jnp.asarray(r.normal(size=(b, 1, 64, 64, 8)) * 0.2, dt)
        ctx = jnp.asarray(r.normal(size=(b, 2, ucfg.cross_attention_dim)), dt)
        for impl in ("pallas", "xla"):
            for with_ref in (True, False):
                try:
                    f = partial(chain, attn_impl=impl, with_ref=with_ref)
                    t = (timeit(f, up, x, ref, ctx) - rt) / ITERS
                except Exception as e:
                    print(f"b{b} {impl} ref={with_ref}: FAILED "
                          f"{type(e).__name__} {str(e)[:150]}", flush=True)
                    continue
                print(f"unet fwd b{b} attn={impl:6s} ref={int(with_ref)}: "
                      f"{t*1e3:7.2f} ms/iter ({t*1e3/b:6.2f} ms/img)",
                      flush=True)


if __name__ == "__main__":
    main()
