"""Why does GN+SiLU+conv compose 3x slower than its parts? Ablation."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.models import layers as L

dt = jnp.bfloat16
ITERS = 16
B, HW, C = 3, 512, 128
CONV_TF = 2 * 2 * B * HW * HW * C * C * 9 / 1e12  # 2 convs per block


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(name, block):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (B, HW, HW, C)), dt)
    p = {
        "norm1": {"scale": jnp.ones((C,), dt), "bias": jnp.zeros((C,), dt)},
        "conv1": {"kernel": jnp.asarray(r.normal(size=(3, 3, C, C)) * 0.02, dt),
                  "bias": jnp.zeros((C,), dt)},
        "norm2": {"scale": jnp.ones((C,), dt), "bias": jnp.zeros((C,), dt)},
        "conv2": {"kernel": jnp.asarray(r.normal(size=(3, 3, C, C)) * 0.02, dt),
                  "bias": jnp.zeros((C,), dt)},
    }

    def chain(p, x):
        for _ in range(ITERS):
            x = block(p, x)
        return x.astype(jnp.float32).sum()

    t = (timeit(jax.jit(chain), p, x) - RT) / ITERS
    print(f"{name:46s} {t * 1e3:7.2f} ms  {CONV_TF / t:6.1f} TF/s", flush=True)


def gn_stats_affine(p, x, groups=32):
    """Current group_norm split into (stats) and (affine apply) pieces."""
    return L.group_norm(p, x, groups=groups, eps=1e-6)


def gn_no_stats(p, x):
    """Affine only (constants instead of computed stats)."""
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def gn_stats_stopgrad_barrier(p, x, groups=32):
    """Stats with optimization_barrier around the affine coefficients so XLA
    cannot fuse the stats reduction into the consumer conv's operand."""
    b, c = x.shape[0], x.shape[-1]
    flat = x.reshape(b, -1, c)
    n = flat.shape[1] * (c // groups)
    xf = flat.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(jnp.square(xf), axis=1)
    s1g = s1.reshape(b, groups, -1).sum(-1)
    s2g = s2.reshape(b, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-6)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    A = (inv_c * scale[None]).astype(x.dtype)
    Bc = (bias[None] - mean_c * inv_c * scale[None]).astype(x.dtype)
    A, Bc = jax.lax.optimization_barrier((A, Bc))
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * A.reshape(shape) + Bc.reshape(shape)


def gn_dtype_reduce(p, x, groups=32):
    """Stats with no explicit f32 producer: dtype-accumulating reduce for s1,
    einsum contraction (bf16 in, f32 out) for the sum of squares."""
    b, c = x.shape[0], x.shape[-1]
    axes = tuple(range(1, x.ndim - 1))
    n = int(np.prod([x.shape[a] for a in axes])) * (c // groups)
    s1 = jnp.sum(x, axis=axes, dtype=jnp.float32)
    letters = "hwzy"[: len(axes)]
    sub = f"b{letters}c,b{letters}c->bc"
    s2 = jnp.einsum(sub, x, x, preferred_element_type=jnp.float32)
    s1g = s1.reshape(b, groups, -1).sum(-1)
    s2g = s2.reshape(b, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-6)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    A = (inv_c * scale[None]).astype(x.dtype)
    Bc = (bias[None] - mean_c * inv_c * scale[None]).astype(x.dtype)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * A.reshape(shape) + Bc.reshape(shape)


def gn_bf16_stats(p, x, groups=32):
    """Stats fully in bf16 (accuracy bound, cost bound)."""
    b, c = x.shape[0], x.shape[-1]
    axes = tuple(range(1, x.ndim - 1))
    n = int(np.prod([x.shape[a] for a in axes])) * (c // groups)
    s1 = jnp.sum(x, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(x * x, axis=axes, dtype=jnp.float32)
    s1g = s1.reshape(b, groups, -1).sum(-1)
    s2g = s2.reshape(b, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-6)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    A = (inv_c).astype(x.dtype)
    Bc = (-mean_c * inv_c).astype(x.dtype)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * A.reshape(shape) + Bc.reshape(shape)


def gn_reduce_window(p, x, groups=32):
    """Stats via reduce_window (full-spatial window): windowed ops get
    conv-style layout treatment, potentially avoiding the reconciliation
    copies that plain reduces trigger."""
    b, h, w, c = x.shape
    n = h * w * (c // groups)
    xf = x.astype(jnp.float32)
    s1 = jax.lax.reduce_window(xf, 0.0, jax.lax.add, (1, h, w, 1),
                               (1, h, w, 1), "VALID")[:, 0, 0, :]   # (B, C)
    s2 = jax.lax.reduce_window(jnp.square(xf), 0.0, jax.lax.add,
                               (1, h, w, 1), (1, h, w, 1), "VALID")[:, 0, 0, :]
    s1g = s1.reshape(b, groups, -1).sum(-1)
    s2g = s2.reshape(b, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-6)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    A = (inv_c * scale[None]).astype(x.dtype)
    Bc = (bias[None] - mean_c * inv_c * scale[None]).astype(x.dtype)
    return x * A[:, None, None, :] + Bc[:, None, None, :]


def main():
    global RT
    f0 = jax.jit(lambda x: x.astype(jnp.float32).sum())
    RT = timeit(f0, jnp.zeros((8, 128), dt))
    print(f"RT {RT*1e3:.1f} ms", flush=True)

    def mk_block(gn):
        def blk(p, x):
            h = gn(p["norm1"], x)
            h = L.silu(h)
            h = L.conv2d(p["conv1"], h)
            h = gn(p["norm2"], h)
            h = L.silu(h)
            h = L.conv2d(p["conv2"], h)
            return x + h
        return blk

    run("resnet GN=current (stats+affine)", mk_block(gn_stats_affine))
    run("resnet GN=affine only (no stats)", mk_block(gn_no_stats))
    run("resnet GN=dtype-reduce + einsum sq", mk_block(gn_dtype_reduce))
    run("resnet GN=reduce_window stats", mk_block(gn_reduce_window))
    run("resnet GN=bf16 stats", mk_block(gn_bf16_stats))
    run("resnet GN=stats + opt-barrier affine", mk_block(gn_stats_stopgrad_barrier))

    def blk_no_residual(p, x):
        h = gn_stats_affine(p["norm1"], x)
        h = L.silu(h)
        h = L.conv2d(p["conv1"], h)
        h = gn_stats_affine(p["norm2"], h)
        h = L.silu(h)
        return L.conv2d(p["conv2"], h)
    run("resnet GN=current, no residual", blk_no_residual)

    def blk_barrier_after_gn(p, x):
        h = gn_stats_affine(p["norm1"], x)
        h = jax.lax.optimization_barrier(L.silu(h))
        h = L.conv2d(p["conv1"], h)
        h = gn_stats_affine(p["norm2"], h)
        h = jax.lax.optimization_barrier(L.silu(h))
        h = L.conv2d(p["conv2"], h)
        return x + h
    run("resnet GN=current + barrier before conv", blk_barrier_after_gn)

    # the shipped block (Pallas fused GN+SiLU on TPU)
    run("resnet GN=pallas fused (shipped)",
        lambda p, x: L.resnet_block(p, x, None, groups=32, eps=1e-6))

    # full VAE encode, episode bsz 1 (3 streams) and 8 (24 streams)
    import time as _t

    from diffews_tpu.configs import VAEConfig
    from diffews_tpu.models import vae
    vcfg = VAEConfig.sd()
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    vp = jax.tree_util.tree_map(lambda a: a.astype(dt), vp)
    enc = jax.jit(lambda vp, x: vae.encode_mean_latent(vp, vcfg, x)
                  .astype(jnp.float32).sum())
    for nb in (3, 24):
        r = np.random.default_rng(0)
        imgs = jnp.asarray(r.uniform(-1, 1, (nb, 512, 512, 3)), dt)
        t = timeit(enc, vp, imgs) - RT
        print(f"VAE encode x{nb:2d} (fused GN): {t * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
