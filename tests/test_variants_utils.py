"""Attn-mask UNet variant + misc utils (batchsize, ensemble, image, seeding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import unet

ufwd = jax.jit(unet.forward, static_argnames=("cfg", "attn_impl", "remat"))


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(0))
    return cfg, params


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


class TestAttnMaskVariant:
    def test_zero_mask_suppresses_support(self, tiny):
        """(1-mask)*-1e4 with mask==0 suppresses all support keys, so the
        output must equal the plain (no-support) forward."""
        cfg, params = tiny
        x = _rand(1, 8, 8, 4, seed=1)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=2)
        ref4 = _rand(1, 2, 8, 8, 4, seed=3)
        y = ufwd(params, cfg, x, 1, ctx, ref_sample=ref4,
                 ref_mask=jnp.zeros((1, 2, 64, 64)))
        y_plain = ufwd(params, cfg, x, 1, ctx)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain),
                                   rtol=1e-4, atol=1e-5)

    def test_mask_region_selectivity(self, tiny):
        cfg, params = tiny
        x = _rand(1, 8, 8, 4, seed=4)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=5)
        ref4 = _rand(1, 1, 8, 8, 4, seed=6)
        full = ufwd(params, cfg, x, 1, ctx, ref_sample=ref4,
                    ref_mask=jnp.ones((1, 1, 64, 64)))
        half = jnp.zeros((1, 1, 64, 64)).at[:, :, :32].set(1.0)
        partial = ufwd(params, cfg, x, 1, ctx, ref_sample=ref4, ref_mask=half)
        assert not np.allclose(np.asarray(full), np.asarray(partial), atol=1e-5)

    def test_pallas_path_matches_xla(self, tiny):
        cfg, params = tiny
        x = _rand(1, 8, 8, 4, seed=7)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=8)
        ref4 = _rand(1, 1, 8, 8, 4, seed=9)
        mask = jnp.asarray((np.random.default_rng(10).random((1, 1, 64, 64)) > 0.5)
                           .astype(np.float32))
        y_xla = ufwd(params, cfg, x, 1, ctx, ref_sample=ref4, ref_mask=mask,
                     attn_impl="xla")
        y_pal = ufwd(params, cfg, x, 1, ctx, ref_sample=ref4, ref_mask=mask,
                     attn_impl="pallas")
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                                   rtol=5e-4, atol=5e-4)


class TestUtils:
    def test_batchsize_lookup(self):
        from diffews_tpu.utils.batchsize import find_batch_size

        assert find_batch_size(100, 512, bf16=True, hbm_gib=16) == 16
        assert find_batch_size(100, 512, bf16=False, hbm_gib=16) == 8
        assert find_batch_size(100, 768, bf16=True, hbm_gib=16) == 6
        assert find_batch_size(4, 512, bf16=True, hbm_gib=16) == 4  # capped by work
        assert find_batch_size(100, 512, bf16=True, hbm_gib=2) == 1

    def test_ensemble_depths_aligns_affine_members(self):
        from diffews_tpu.utils.ensemble import ensemble_depths

        rng = np.random.default_rng(0)
        base = rng.random((16, 16)).astype(np.float64)
        members = np.stack([base * 2.0 + 1.0, base * 0.5 - 3.0, base])
        depth, unc = ensemble_depths(members, max_iter=50)
        assert depth.shape == (16, 16)
        # aligned+normalized result correlates ~1 with the base field
        c = np.corrcoef(depth.ravel(), base.ravel())[0, 1]
        assert c > 0.999
        assert np.all(unc >= 0)

    def test_colorize_and_chw2hwc(self):
        from diffews_tpu.utils.image import chw2hwc, colorize_depth_maps, norm_to_rgb

        d = np.random.default_rng(1).random((8, 8)).astype(np.float32)
        col = colorize_depth_maps(d, 0, 1)
        assert col.shape == (1, 3, 8, 8)
        assert col.min() >= 0 and col.max() <= 1
        assert chw2hwc(col[0]).shape == (8, 8, 3)
        n = np.zeros((3, 4, 4), np.float32)
        assert norm_to_rgb(n).dtype == np.uint8

    def test_fix_randseed(self):
        from diffews_tpu.utils.seeding import fix_randseed

        fix_randseed(0)
        a = np.random.rand(3)
        fix_randseed(0)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)
