"""Fused resnet megakernel on-chip: correctness + timing vs XLA chain.

Phase 1 (kernel): gn_silu_conv3x3 vs the XLA reference at each VAE level
shape, in-graph chains of ITERS calls to amortize the ~25 ms tunnel RT.
Phase 2 (model): full VAE encode/decode with resnet_impl xla vs fused.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import VAEConfig
from diffews_tpu.models import vae
from diffews_tpu.ops import fused_resnet as FR

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


def phase1():
    print("== phase 1: kernel vs XLA reference chain ==", flush=True)
    for (B, H, C) in [(3, 512, 128), (3, 256, 256), (3, 128, 512), (3, 64, 512)]:
        r = np.random.default_rng(0)
        x = jnp.asarray(r.uniform(-1, 1, (B, H, H, C)), dt)
        a = jnp.asarray(r.uniform(0.5, 1.5, (B, C)), jnp.float32)
        b = jnp.asarray(r.uniform(-0.2, 0.2, (B, C)), jnp.float32)
        w = jnp.asarray(r.normal(size=(3, 3, C, C)) * (0.5 / C) ** 0.5, dt)
        bias = jnp.asarray(r.normal(size=(C,)) * 0.01, jnp.float32)

        def chain(impl):
            def f(x, a, b, w, bias):
                y = x
                for _ in range(ITERS):
                    y, s1, s2 = FR.gn_silu_conv3x3(y, a, b, w, bias, y,
                                                   impl=impl)
                return (y.astype(jnp.float32).sum()
                        + s1.sum() + s2.sum() * 0.0)
            return jax.jit(f)

        # correctness (one call, both impls, f32 readback of moments)
        one_p = jax.jit(lambda *t: FR.gn_silu_conv3x3(*t, impl="pallas")[0]
                        .astype(jnp.float32).sum())
        one_x = jax.jit(lambda *t: FR.gn_silu_conv3x3(*t, impl="xla")[0]
                        .astype(jnp.float32).sum())
        sp, sx = float(one_p(x, a, b, w, bias, x)), float(one_x(x, a, b, w, bias, x))
        flops = 2 * B * H * H * C * C * 9 * ITERS
        tp = timeit(chain("pallas"), x, a, b, w, bias) / ITERS
        tx = timeit(chain("xla"), x, a, b, w, bias) / ITERS
        print(f"B{B} {H}^2 C{C}: pallas {tp*1e3:6.2f} ms ({flops/ITERS/tp/1e12:5.1f} TF/s)"
              f"  xla {tx*1e3:6.2f} ms ({flops/ITERS/tx/1e12:5.1f} TF/s)"
              f"  sums p/x {sp:.1f}/{sx:.1f}", flush=True)


def phase2():
    print("== phase 2: full VAE ==", flush=True)
    vcfg = VAEConfig.sd()
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    vp = jax.tree_util.tree_map(lambda a: a.astype(dt), vp)
    for impl in ("xla", "fused", "mixed"):
        enc = jax.jit(lambda vp, x, i=impl: vae.encode_mean_latent(
            vp, vcfg, x, resnet_impl=i).astype(jnp.float32).sum())
        dec = jax.jit(lambda vp, z, i=impl: vae.decode(
            vp, vcfg, z, resnet_impl=i).astype(jnp.float32).sum())
        for nb in (3, 24):
            r = np.random.default_rng(0)
            imgs = jnp.asarray(r.uniform(-1, 1, (nb, 512, 512, 3)), dt)
            t = timeit(enc, vp, imgs)
            print(f"encode resnet={impl:5s} b{nb:2d}: {t*1e3:7.1f} ms", flush=True)
        for nb in (1, 8):
            r = np.random.default_rng(0)
            z = jnp.asarray(r.normal(size=(nb, 64, 64, 4)) * 0.2, dt)
            t = timeit(dec, vp, z)
            print(f"decode resnet={impl:5s} b{nb:2d}: {t*1e3:7.1f} ms", flush=True)


def ablate():
    """Bisect the kernel's ~43 TF/s plateau: time the pallas kernel with
    each VPU stage skipped (WRONG results; timing only), at saturated and
    unsaturated shapes."""
    print("== ablation: which VPU stage costs what ==", flush=True)
    for (B, H, C) in [(3, 512, 128), (24, 512, 128), (8, 256, 256)]:
        r = np.random.default_rng(0)
        x = jnp.asarray(r.uniform(-1, 1, (B, H, H, C)), dt)
        a = jnp.asarray(r.uniform(0.5, 1.5, (B, C)), jnp.float32)
        b = jnp.asarray(r.uniform(-0.2, 0.2, (B, C)), jnp.float32)
        w = jnp.asarray(r.normal(size=(3, 3, C, C)) * (0.5 / C) ** 0.5, dt)
        bias = jnp.asarray(r.normal(size=(C,)) * 0.01, jnp.float32)
        flops = 2 * B * H * H * C * C * 9 * ITERS

        def chain():
            def f(x, a, b, w, bias):
                y = x
                for _ in range(ITERS):
                    y, s1, s2 = FR.gn_silu_conv3x3(y, a, b, w, bias, y,
                                                   impl="pallas")
                return y.astype(jnp.float32).sum() + s1.sum() * 0.0
            return jax.jit(f)

        for knobs in (
            {},
            {"silu": True},
            {"mask": True},
            {"rolls": True},
            {"stats": True},
            {"silu": True, "mask": True, "rolls": True, "stats": True},
        ):
            FR.ABLATE.update({k: False for k in FR.ABLATE})
            FR.ABLATE.update(knobs)
            jax.clear_caches()  # knobs are trace-time constants
            t = timeit(chain(), x, a, b, w, bias) / ITERS
            name = "+".join(knobs) or "full"
            print(f"B{B} {H}^2 C{C} skip[{name:26s}] {t*1e3:7.2f} ms "
                  f"{flops/ITERS/t/1e12:5.1f} TF/s", flush=True)
        FR.ABLATE.update({k: False for k in FR.ABLATE})


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    if "ablate" in sys.argv:
        ablate()
        sys.exit(0)
    if "phase2" not in sys.argv:
        phase1()
    if "phase1" not in sys.argv:
        phase2()
