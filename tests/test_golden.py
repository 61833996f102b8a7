"""Golden-activation parity vs the torch/diffusers stack.

Skipped unless `tests/golden/golden.npz` exists — generate it with
`python tools/make_golden.py` in a diffusers-equipped environment.  When
present, this asserts numeric parity of our UNet/VAE forwards against the
reference implementations through real diffusers-format weights.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(GOLDEN_DIR, "golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="no golden fixtures (run tools/make_golden.py)"
)


@pytest.fixture(scope="module")
def fixtures():
    from diffews_tpu import checkpoint as C

    data = np.load(GOLDEN)
    unet_params, unet_cfg = C.load_unet(os.path.join(GOLDEN_DIR, "unet"))
    vae_params, vae_cfg = C.load_vae(os.path.join(GOLDEN_DIR, "vae"))
    return data, unet_params, unet_cfg, vae_params, vae_cfg


def test_unet_forward_parity(fixtures):
    from diffews_tpu.models import unet

    data, up, ucfg, _, _ = fixtures
    x = jnp.asarray(data["sample"].transpose(0, 2, 3, 1))
    ctx = jnp.asarray(data["ctx"])
    got = unet.forward(up, ucfg, x, 1, ctx)
    want = data["unet_out"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_vae_encode_parity(fixtures):
    from diffews_tpu.models import vae

    data, _, _, vp, vcfg = fixtures
    img = jnp.asarray(data["img"].transpose(0, 2, 3, 1))
    moments = vae.encode_moments(vp, vcfg, img)
    np.testing.assert_allclose(
        np.asarray(moments), data["vae_moments"].transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4,
    )
    mean = vae.encode_mean_latent(vp, vcfg, img)
    np.testing.assert_allclose(
        np.asarray(mean), data["vae_mean"].transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4,
    )


def test_vae_decode_parity(fixtures):
    from diffews_tpu.models import vae

    data, _, _, vp, vcfg = fixtures
    z = jnp.asarray(data["vae_mean"].transpose(0, 2, 3, 1))
    dec = vae.decode(vp, vcfg, z)
    np.testing.assert_allclose(
        np.asarray(dec), data["vae_dec"].transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-3,
    )
