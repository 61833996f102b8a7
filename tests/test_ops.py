"""Op-level numerical parity against torch-cpu oracles.

diffusers is not installed in this environment, so parity is established at
the op level (conv/groupnorm/layernorm/attention/resize vs torch) plus
architecture-level invariants in test_models.py (SURVEY.md §4 test plan).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from diffews_tpu.models import layers as L
from diffews_tpu.ops.attention import dense_attention, fused_kv_attention
from diffews_tpu.ops.resize import bilinear_resize, nearest_resize

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


class TestConvGroupNorm:
    def test_conv2d_matches_torch(self):
        x = _rand(2, 9, 11, 5)
        w = _rand(3, 3, 5, 7, seed=1)
        b = _rand(7, seed=2)
        y = L.conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
        yt = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            torch.from_numpy(b),
            padding=1,
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)

    def test_conv2d_stride2_asymmetric_pad_matches_torch_vae(self):
        # VAE encoder downsample: F.pad(x, (0,1,0,1)) then conv stride 2 pad 0.
        x = _rand(1, 8, 8, 4)
        w = _rand(3, 3, 4, 4, seed=3)
        b = np.zeros(4, np.float32)
        y = L.downsample2d({"conv": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                           jnp.asarray(x), asymmetric_pad=True)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        xt = F.pad(xt, (0, 1, 0, 1))
        yt = F.conv2d(xt, torch.from_numpy(w).permute(3, 2, 0, 1),
                      torch.from_numpy(b), stride=2).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)

    def test_pallas_downsample_kernel_matches_xla(self):
        """The (dead-end but kept) Pallas stride-2 downsample kernel
        (`ops/downsample.py`) in interpret mode vs the XLA reference,
        including the grad path (custom_vjp routes backward through
        jax.vjp of the XLA formulation)."""
        from diffews_tpu.ops.downsample import downsample_conv2x, _xla_reference

        r = np.random.default_rng(7)
        x = jnp.asarray(r.normal(size=(2, 16, 16, 8)), jnp.float32)
        w = jnp.asarray(r.normal(size=(3, 3, 8, 8)) * 0.2, jnp.float32)
        b = jnp.asarray(r.normal(size=(8,)), jnp.float32)
        ref = _xla_reference(x, w, b)
        got = downsample_conv2x(x, w, b, "interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        assert downsample_conv2x(x, w, b, "auto").shape == ref.shape

        def loss(impl, x, w, b):
            return (downsample_conv2x(x, w, b, impl) ** 2).sum()

        g_ref = jax.grad(functools.partial(loss, "xla"), (0, 1, 2))(x, w, b)
        g_got = jax.grad(functools.partial(loss, "interpret"), (0, 1, 2))(x, w, b)
        for a, c in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-4)

    def test_group_norm_matches_torch(self):
        x = _rand(2, 4, 4, 32)
        scale = _rand(32, seed=4)
        bias = _rand(32, seed=5)
        y = L.group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                         jnp.asarray(x), groups=8, eps=1e-6)
        yt = F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), 8,
                          torch.from_numpy(scale), torch.from_numpy(bias),
                          eps=1e-6).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)

    def test_layer_norm_matches_torch(self):
        x = _rand(2, 7, 16)
        scale, bias = _rand(16, seed=6), _rand(16, seed=7)
        y = L.layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                         jnp.asarray(x), eps=1e-5)
        yt = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale),
                          torch.from_numpy(bias), eps=1e-5)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)

    def test_gelu_exact_matches_torch(self):
        x = _rand(100)
        np.testing.assert_allclose(
            np.asarray(L.gelu(jnp.asarray(x))),
            F.gelu(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6,
        )

    def test_upsample_nearest2x_matches_torch(self):
        x = _rand(1, 5, 3, 2)
        y = L.upsample_nearest2x(jnp.asarray(x))
        yt = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
                           mode="nearest").permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), yt.numpy())


class TestResize:
    def test_nearest_matches_torch_various_sizes(self):
        for (hin, win, hout, wout) in [(7, 5, 512, 512), (512, 512, 375, 500),
                                       (64, 64, 512, 512), (33, 57, 17, 100)]:
            x = _rand(1, hin, win, 3, seed=hin)
            y = nearest_resize(jnp.asarray(x), (hout, wout))
            yt = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               (hout, wout), mode="nearest").permute(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(y), yt.numpy(), err_msg=str((hin, win, hout, wout)))

    def test_bilinear_matches_torch(self):
        for (hin, win, hout, wout) in [(16, 16, 37, 41), (37, 41, 16, 16)]:
            x = _rand(2, hin, win, 3, seed=hout)
            y = bilinear_resize(jnp.asarray(x), (hout, wout))
            yt = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (hout, wout),
                               mode="bilinear", align_corners=False).permute(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-5)


class TestAttention:
    def test_dense_matches_torch_sdpa(self):
        b, s, h, d = 2, 10, 4, 16
        q, k, v = (_rand(b, s, h, d, seed=i) for i in range(3))
        y = dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        yt = F.scaled_dot_product_attention(
            torch.from_numpy(q).permute(0, 2, 1, 3),
            torch.from_numpy(k).permute(0, 2, 1, 3),
            torch.from_numpy(v).permute(0, 2, 1, 3),
        ).permute(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-5)

    def test_fused_kv_equals_explicit_concat(self):
        """KV fusion == concatenating folded support tokens then plain attention.

        Mirrors the reference two-pass semantics: bank of shape (B,N,S,h,d)
        folded to sequence and concatenated after own K/V
        (attention_processor.py:251-271).
        """
        b, n, s, h, d = 2, 3, 6, 2, 8
        q = jnp.asarray(_rand(b, s, h, d, seed=0))
        k_own = jnp.asarray(_rand(b, s, h, d, seed=1))
        v_own = jnp.asarray(_rand(b, s, h, d, seed=2))
        k_sup = jnp.asarray(_rand(b, n, s, h, d, seed=3))
        v_sup = jnp.asarray(_rand(b, n, s, h, d, seed=4))

        got = fused_kv_attention(q, k_own, v_own, k_sup, v_sup)
        k_cat = jnp.concatenate([k_own, k_sup.reshape(b, n * s, h, d)], axis=1)
        v_cat = jnp.concatenate([v_own, v_sup.reshape(b, n * s, h, d)], axis=1)
        want = dense_attention(q, k_cat, v_cat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_padded_shots_equal_physical_drop(self):
        """Padding + mask must be numerically identical to dropping the shots."""
        b, s, h, d = 1, 5, 2, 8
        q = jnp.asarray(_rand(b, s, h, d, seed=0))
        k_own = jnp.asarray(_rand(b, s, h, d, seed=1))
        v_own = jnp.asarray(_rand(b, s, h, d, seed=2))
        k_sup = jnp.asarray(_rand(b, 3, s, h, d, seed=3))
        v_sup = jnp.asarray(_rand(b, 3, s, h, d, seed=4))

        full = fused_kv_attention(
            q, k_own, v_own, k_sup, v_sup,
            shot_mask=jnp.asarray([[True, True, False]]),
        )
        dropped = fused_kv_attention(q, k_own, v_own, k_sup[:, :2], v_sup[:, :2])
        np.testing.assert_allclose(np.asarray(full), np.asarray(dropped), rtol=1e-5, atol=1e-6)

    def test_all_masked_equals_self_attention(self):
        b, s, h, d = 1, 4, 2, 8
        q = jnp.asarray(_rand(b, s, h, d, seed=0))
        k_own = jnp.asarray(_rand(b, s, h, d, seed=1))
        v_own = jnp.asarray(_rand(b, s, h, d, seed=2))
        k_sup = jnp.asarray(_rand(b, 2, s, h, d, seed=3))
        v_sup = jnp.asarray(_rand(b, 2, s, h, d, seed=4))
        fused = fused_kv_attention(q, k_own, v_own, k_sup, v_sup,
                                   shot_mask=jnp.zeros((1, 2), bool))
        plain = fused_kv_attention(q, k_own, v_own, None, None)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=1e-5, atol=1e-6)


def test_timestep_embedding_formula():
    # Independent reimplementation of the sinusoidal formula (diffusers
    # get_timestep_embedding semantics: flip_sin_to_cos puts cos first).
    dim, shift = 32, 0.0
    t = np.array([1.0, 951.0], np.float32)
    half = dim // 2
    freqs = np.exp(
        (-np.log(10000.0) * np.arange(half, dtype=np.float32) / (half - shift)).astype(np.float32)
    ).astype(np.float32)
    arg = (t[:, None] * freqs[None]).astype(np.float32)
    expect = np.concatenate([np.cos(arg), np.sin(arg)], axis=1)
    got = L.timestep_embedding(jnp.asarray(t), dim, flip_sin_to_cos=True,
                               downscale_freq_shift=shift)
    # atol covers f32 ULP effects in sin/cos of large arguments (t=951).
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-3, atol=5e-5)


class TestGroupNormAct:
    """Pallas fused GN+SiLU (ops/groupnorm.py) vs the XLA reference."""

    def test_pallas_matches_xla(self):
        from diffews_tpu.ops.groupnorm import group_norm_act
        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(size=(2, 16, 8, 128)).astype(np.float32) * 2 + 1)
        p = {"scale": jnp.asarray(r.normal(size=(128,)).astype(np.float32)),
             "bias": jnp.asarray(r.normal(size=(128,)).astype(np.float32))}
        for act in (None, "silu"):
            a = group_norm_act(p, x, groups=32, eps=1e-6, act=act, impl="xla")
            b = group_norm_act(p, x, groups=32, eps=1e-6, act=act, impl="pallas")
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=1e-5)

    def test_pallas_grads_match_xla(self):
        from diffews_tpu.ops.groupnorm import group_norm_act
        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(1, 8, 8, 64)).astype(np.float32))
        s = jnp.asarray(r.normal(size=(64,)).astype(np.float32))
        b = jnp.asarray(r.normal(size=(64,)).astype(np.float32))

        def loss(impl):
            return lambda x, s, b: group_norm_act(
                {"scale": s, "bias": b}, x, groups=16, eps=1e-6,
                act="silu", impl=impl).sum()

        gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(x, s, b)
        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, s, b)
        for a_, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)


def test_cross_attention_key_mask_drops_tokens():
    from diffews_tpu.ops.attention import cross_attention
    r = np.random.default_rng(0)
    q = jnp.asarray(r.normal(size=(2, 5, 4, 8)).astype(np.float32))
    k = jnp.asarray(r.normal(size=(2, 7, 4, 8)).astype(np.float32))
    v = jnp.asarray(r.normal(size=(2, 7, 4, 8)).astype(np.float32))
    mask = np.ones((2, 7), bool)
    mask[:, 5:] = False
    masked = cross_attention(q, k, v, key_mask=jnp.asarray(mask))
    trunc = cross_attention(q, k[:, :5], v[:, :5])
    np.testing.assert_allclose(np.asarray(masked), np.asarray(trunc),
                               atol=1e-6, rtol=1e-6)
