"""Stride-2 downsample conv: XLA native vs space-to-depth reformulation.

The episode profile (tools/tpu_profile_episode.py + HLO) shows the VAE's
regular 3x3 convs run at ~190 TF/s (97% of bf16 peak) but the stride-2
downsample convs run at ~31 TF/s ("EmitAllBatchInSublanes" emitter) —
~37 ms of the 183 ms b24 encode.  Reformulating as space-to-depth (pad,
2x2-phase deinterleave to 4C channels, stride-1 2x2 conv with the 3x3
kernel scattered into a zero-padded 4x4 phase kernel) keeps the math
exact while giving the MXU a dense stride-1 conv (1.78x the FLOPs at ~6x
the rate).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

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


def native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def s2d(x, w):
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    h2, w2 = (h + 2) // 2, (wd + 2) // 2
    xs = (xp.reshape(b, h2, 2, w2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h2, w2, 4 * c))
    # w4[a, bb, di, dj, ci, co] = w[2a+di, 2bb+dj, ci, co], zero for taps >= 3
    w4 = jnp.zeros((2, 2, 2, 2, c, cout), w.dtype)
    for a in range(2):
        for bb in range(2):
            for di in range(2):
                for dj in range(2):
                    ki, kj = 2 * a + di, 2 * bb + dj
                    if ki < 3 and kj < 3:
                        w4 = w4.at[a, bb, di, dj].set(w[ki, kj])
    w4 = w4.reshape(2, 2, 4 * c, cout)
    return jax.lax.conv_general_dilated(
        xs, w4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def stride1_slice(x, w):
    """Full stride-1 conv (the fast emitter) then ::2 slice — 4x the
    FLOPs at the ~6x faster rate."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y[:, ::2, ::2, :]


def taps(x, w):
    """3x3 stride-2 conv as NINE strided-slice matmuls (no conv emitter):
    for each kernel tap (ky,kx), a (B*H/2*W/2, C) x (C, CO) dot over the
    stride-2-sliced input, accumulated in f32."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    h2, w2 = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    acc = jnp.zeros((b, h2, w2, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = jax.lax.slice(
                xp, (0, ky, kx, 0),
                (b, ky + 2 * (h2 - 1) + 1, kx + 2 * (w2 - 1) + 1, c),
                (1, 2, 2, 1))
            acc = acc + jnp.einsum(
                "bhwc,co->bhwo", xs, w[ky, kx],
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def main():
    r = np.random.default_rng(0)
    # correctness at small size (f32)
    x = jnp.asarray(r.normal(size=(2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(r.normal(size=(3, 3, 8, 8)), jnp.float32)
    err = float(jnp.max(jnp.abs(native(x, w) - s2d(x, w))))
    print(f"correctness max err (f32, 16^2): {err:.2e}", flush=True)
    assert err < 1e-4
    err2 = float(jnp.max(jnp.abs(native(x, w) - stride1_slice(x, w))))
    print(f"stride1+slice correctness: {err2:.2e}", flush=True)
    assert err2 < 1e-4
    err3 = float(jnp.max(jnp.abs(native(x, w) - taps(x, w))))
    print(f"taps correctness: {err3:.2e}", flush=True)
    assert err3 < 1e-4
    # pallas kernel on-device correctness at a realistic tiled shape
    from diffews_tpu.ops.downsample import downsample_conv2x
    xc = jnp.asarray(r.normal(size=(2, 64, 64, 128)), jnp.float32)
    wc = jnp.asarray(r.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    bc = jnp.asarray(r.normal(size=(128,)), jnp.float32)
    ref = native(xc, wc) + bc
    got = downsample_conv2x(xc, wc, bc, "pallas")
    err4 = float(jnp.max(jnp.abs(ref - got)))
    print(f"pallas correctness (64^2 C128, f32): {err4:.2e}", flush=True)
    assert err4 < 1e-3, err4

    for (B, H, C, CO) in [(24, 512, 128, 128), (24, 256, 256, 256),
                          (24, 128, 512, 512)]:
        x = jnp.asarray(r.normal(size=(B, H, H, C)), dt)
        w = jnp.asarray(r.normal(size=(3, 3, C, CO)) * 0.05, dt)
        flops = 2 * B * (H // 2) ** 2 * C * CO * 9 * ITERS

        def chain(fn):
            def f(x, w):
                y = x
                for _ in range(ITERS):
                    y = fn(y, w)
                    # chain via upsample back to input size (nearest), so
                    # the timed op dominates
                    y = jnp.repeat(jnp.repeat(y, 2, 1), 2, 2)[..., :C]
                return y.astype(jnp.float32).sum()
            return jax.jit(f)

        from diffews_tpu.ops.downsample import downsample_conv2x

        def pallas_ds(x, w):
            return downsample_conv2x(x, w, jnp.zeros((w.shape[-1],), x.dtype),
                                     "pallas")

        for name, fn in (("native", native), ("pallas", pallas_ds)):
            t = timeit(chain(fn), x, w) / ITERS
            print(f"B{B} {H}^2 C{C}->{CO} {name:7s} {t*1e3:7.2f} ms "
                  f"{flops/ITERS/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
