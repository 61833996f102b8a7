"""Architecture-level tests for VAE / UNet / CLIP-text on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import CLIPTextConfig, UNetConfig, VAEConfig
from diffews_tpu.models import clip_text, unet, vae


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


# jit everything: eager dispatch is orders of magnitude slower on this host
ufwd = jax.jit(unet.forward, static_argnames=("cfg", "attn_impl", "remat"))
vae_encode = jax.jit(vae.encode_moments, static_argnames=("cfg",))
vae_mean = jax.jit(vae.encode_mean_latent, static_argnames=("cfg",))
vae_dec = jax.jit(vae.decode, static_argnames=("cfg",))
vae_sample = jax.jit(vae.sample_latent, static_argnames=("cfg",))
clip_fwd = jax.jit(clip_text.forward, static_argnames=("cfg",))


@pytest.fixture(scope="module")
def vae_setup():
    cfg = VAEConfig.tiny()
    params = jax.jit(lambda r: vae.init_params(r, cfg))(jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def unet_setup():
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(1))
    return cfg, params


class TestVAE:
    def test_encode_decode_shapes(self, vae_setup):
        cfg, params = vae_setup
        x = _rand(2, 32, 32, 3)
        moments = vae_encode(params, cfg, x)
        assert moments.shape == (2, 16, 16, 8)  # tiny cfg: one downsample
        z = vae_mean(params, cfg, x)
        assert z.shape == (2, 16, 16, 4)
        y = vae_dec(params, cfg, z)
        assert y.shape == (2, 32, 32, 3)

    def test_mean_latent_is_scaled_mean(self, vae_setup):
        cfg, params = vae_setup
        x = _rand(1, 32, 32, 3, seed=1)
        moments = vae_encode(params, cfg, x)
        z = vae_mean(params, cfg, x)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(moments[..., :4]) * cfg.scaling_factor, rtol=1e-6
        )

    def test_sample_latent_deterministic_per_key(self, vae_setup):
        cfg, params = vae_setup
        x = _rand(1, 32, 32, 3, seed=2)
        z1 = vae_sample(params, cfg, x, jax.random.PRNGKey(7))
        z2 = vae_sample(params, cfg, x, jax.random.PRNGKey(7))
        z3 = vae_sample(params, cfg, x, jax.random.PRNGKey(8))
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
        assert not np.allclose(np.asarray(z1), np.asarray(z3))


class TestUNet:
    def test_plain_forward_shape(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(2, 8, 8, 4)
        ctx = _rand(2, 2, cfg.cross_attention_dim, seed=3)
        y = ufwd(params, cfg, x, 1, ctx)
        assert y.shape == (2, 8, 8, 4)

    def test_ref_forward_shape(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(2, 8, 8, 4)
        ref = _rand(2, 3, 8, 8, 8, seed=4)
        ctx = _rand(2, 2, cfg.cross_attention_dim, seed=5)
        y = ufwd(params, cfg, x, 1, ctx, ref_sample=ref)
        assert y.shape == (2, 8, 8, 4)

    def test_all_shots_masked_equals_plain(self, unet_setup):
        """Fully-masked support == vanilla UNet — validates the entire
        KV-fusion plumbing (conv_in_ref path, folding, masking) end to end."""
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=6)
        ref = _rand(1, 2, 8, 8, 8, seed=7)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=8)
        y_ref = ufwd(params, cfg, x, 1, ctx, ref_sample=ref,
                             shot_mask=jnp.zeros((1, 2), bool))
        y_plain = ufwd(params, cfg, x, 1, ctx)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_plain),
                                   rtol=1e-4, atol=1e-5)

    def test_shot_permutation_invariance(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=9)
        ref = _rand(1, 3, 8, 8, 8, seed=10)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=11)
        y1 = ufwd(params, cfg, x, 1, ctx, ref_sample=ref)
        y2 = ufwd(params, cfg, x, 1, ctx, ref_sample=ref[:, [2, 0, 1]])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)

    def test_support_actually_conditions_query(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=12)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=13)
        y1 = ufwd(params, cfg, x, 1, ctx, ref_sample=_rand(1, 1, 8, 8, 8, seed=14))
        y2 = ufwd(params, cfg, x, 1, ctx, ref_sample=_rand(1, 1, 8, 8, 8, seed=15))
        assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)

    def test_gradient_flows_into_support_stream(self, unet_setup):
        """The functional design needs no `ref_pred * 0.` DDP hack: the query
        loss must produce nonzero grads on conv_in_ref via the fused K/V."""
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=16)
        ref = _rand(1, 1, 8, 8, 8, seed=17)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=18)

        def loss_fn(p):
            out = ufwd(p, cfg, x, 1, ctx, ref_sample=ref)
            return jnp.mean(out**2)

        grads = jax.jit(jax.grad(loss_fn))(params)
        g = np.asarray(grads["conv_in_ref"]["kernel"])
        assert np.abs(g).max() > 0

    def test_remat_matches_no_remat(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=19)
        ref = _rand(1, 1, 8, 8, 8, seed=20)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=21)
        y1 = ufwd(params, cfg, x, 1, ctx, ref_sample=ref, remat=False)
        y2 = jax.jit(
            lambda p: ufwd(p, cfg, x, 1, ctx, ref_sample=ref, remat=True)
        )(params)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


class TestCLIPText:
    def test_forward_shapes_and_causality(self):
        cfg = CLIPTextConfig.tiny()
        params = clip_text.init_params(jax.random.PRNGKey(2), cfg)
        ids = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
        out = clip_fwd(params, cfg, ids)
        assert out.shape == (1, 4, cfg.hidden_size)
        # causal: changing a later token must not affect earlier positions
        ids2 = ids.at[0, 3].set(9)
        out2 = clip_fwd(params, cfg, ids2)
        np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(out2[:, :3]),
                                   rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(out[:, 3]), np.asarray(out2[:, 3]))

    def test_empty_prompt_ids(self):
        cfg = CLIPTextConfig.sd21()
        ids = clip_text.empty_prompt_ids(cfg)
        assert ids.tolist() == [[49406, 49407]]
        padded = clip_text.empty_prompt_ids(cfg, pad_to=77)
        assert padded.shape == (1, 77)
        assert padded.tolist()[0][:3] == [49406, 49407, 0]


def test_sd21_param_count():
    """Full SD-2.1 UNet parameter count sanity (~866M + conv_in_ref)."""
    cfg = UNetConfig.sd21()
    # count without materializing: rough check via tiny is covered elsewhere;
    # here we verify config arithmetic only.
    assert cfg.time_embed_dim == 1280
    assert cfg.num_levels == 4
    heads = cfg.num_attention_heads
    for i, c in enumerate(cfg.block_out_channels):
        assert c // heads[i] == 64  # SD-2.x: head_dim 64 everywhere
