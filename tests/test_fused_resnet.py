"""Fused resnet megakernel (ops/fused_resnet.py) — interpret-mode parity.

The kernel must match (a) its own XLA reference formulation to float
rounding, (b) the production `layers.resnet_block` path through the whole
VAE, and (c) the reference formulation's gradients (custom_vjp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import VAEConfig
from diffews_tpu.models import layers as L
from diffews_tpu.models import vae
from diffews_tpu.ops import fused_resnet as FR


def _inputs(B, H, W, Cin, Cout, res, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(B, H, W, Cin)), dtype)
    a = jnp.asarray(r.uniform(0.5, 1.5, (B, Cin)), jnp.float32)
    b = jnp.asarray(r.uniform(-0.3, 0.3, (B, Cin)), jnp.float32)
    w = jnp.asarray(r.normal(size=(3, 3, Cin, Cout)) * 0.05, dtype)
    bias = jnp.asarray(r.normal(size=(Cout,)) * 0.1, jnp.float32)
    rr = jnp.asarray(r.normal(size=(B, H, W, Cout)), dtype) if res else None
    return x, a, b, w, bias, rr


class TestKernel:
    @pytest.mark.parametrize("shape", [
        (1, 16, 16, 128, 128, False),
        (2, 32, 16, 128, 256, True),   # Cin != Cout, batch, residual
        (1, 8, 8, 256, 128, True),
        (1, 16, 8, 32, 32, True),      # narrow channels (tiny configs)
    ])
    def test_matches_reference(self, shape):
        B, H, W, Cin, Cout, res = shape
        args = _inputs(B, H, W, Cin, Cout, res)
        y0, s10, s20 = FR._reference(*args)
        y1, s11, s21 = FR.gn_silu_conv3x3(*args, impl="pallas")
        np.testing.assert_allclose(y1, y0, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(s11, s10, atol=5e-3, rtol=1e-5)
        np.testing.assert_allclose(s21, s20, atol=2e-2, rtol=1e-5)

    def test_single_row_tile_grid(self):
        # H == bh (one tile): both halo rows are boundary-zeroed
        args = _inputs(1, 8, 16, 128, 128, False)
        y0, _, _ = FR._reference(*args)
        y1, _, _ = FR.gn_silu_conv3x3(*args, impl="pallas")
        np.testing.assert_allclose(y1, y0, atol=2e-5, rtol=1e-5)

    def test_gradients_match_reference(self):
        x, a, b, w, bias, r = _inputs(1, 8, 8, 32, 32, True)

        def loss_pallas(x, a, b, w, bias, r):
            y, s1, s2 = FR.gn_silu_conv3x3(x, a, b, w, bias, r, impl="pallas")
            return (y ** 2).sum() + s1.sum() * 0.1 + s2.sum() * 0.01

        def loss_ref(x, a, b, w, bias, r):
            y, s1, s2 = FR._reference(x, a, b, w, bias, r)
            return (y ** 2).sum() + s1.sum() * 0.1 + s2.sum() * 0.01

        gp = jax.grad(loss_pallas, argnums=(0, 2, 3, 5))(x, a, b, w, bias, r)
        gr = jax.grad(loss_ref, argnums=(0, 2, 3, 5))(x, a, b, w, bias, r)
        for p, q in zip(gp, gr):
            np.testing.assert_allclose(p, q, atol=1e-4, rtol=1e-4)


class TestBlockAndVAE:
    def test_block_matches_resnet_block(self):
        # production parity: fused block vs layers.resnet_block
        r = np.random.default_rng(1)
        Cin, Cout = 32, 64
        p = {
            "norm1": {"scale": jnp.asarray(r.uniform(0.5, 1.5, (Cin,)), jnp.float32),
                      "bias": jnp.asarray(r.normal(size=(Cin,)) * 0.1, jnp.float32)},
            "conv1": {"kernel": jnp.asarray(r.normal(size=(3, 3, Cin, Cout)) * 0.05, jnp.float32),
                      "bias": jnp.zeros((Cout,), jnp.float32)},
            "norm2": {"scale": jnp.ones((Cout,), jnp.float32),
                      "bias": jnp.zeros((Cout,), jnp.float32)},
            "conv2": {"kernel": jnp.asarray(r.normal(size=(3, 3, Cout, Cout)) * 0.05, jnp.float32),
                      "bias": jnp.zeros((Cout,), jnp.float32)},
            "conv_shortcut": {"kernel": jnp.asarray(r.normal(size=(1, 1, Cin, Cout)) * 0.1, jnp.float32),
                              "bias": jnp.zeros((Cout,), jnp.float32)},
        }
        x = jnp.asarray(r.normal(size=(2, 16, 16, Cin)), jnp.float32)
        want = L.resnet_block(p, x, None, groups=8, eps=1e-6)
        got, (s1, s2) = FR.fused_resnet_block(p, x, None, groups=8, eps=1e-6,
                                              impl="pallas")
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
        # emitted stats are the sums of the output
        np.testing.assert_allclose(
            s1, np.asarray(got, np.float32).sum((1, 2)), atol=5e-3)

    def test_stats_threading_chain(self):
        # two chained blocks == two independent blocks (stats are exact)
        r = np.random.default_rng(2)
        C = 32
        mk = lambda: {
            "norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
            "conv1": {"kernel": jnp.asarray(r.normal(size=(3, 3, C, C)) * 0.05, jnp.float32),
                      "bias": jnp.zeros((C,))},
            "norm2": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
            "conv2": {"kernel": jnp.asarray(r.normal(size=(3, 3, C, C)) * 0.05, jnp.float32),
                      "bias": jnp.zeros((C,))},
        }
        p1, p2 = mk(), mk()
        x = jnp.asarray(r.normal(size=(1, 16, 16, C)), jnp.float32)
        h1, st = FR.fused_resnet_block(p1, x, None, groups=8, eps=1e-6, impl="pallas")
        chained, _ = FR.fused_resnet_block(p2, h1, st, groups=8, eps=1e-6, impl="pallas")
        fresh, _ = FR.fused_resnet_block(p2, h1, None, groups=8, eps=1e-6, impl="pallas")
        np.testing.assert_allclose(chained, fresh, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("fn", ["encode", "decode"])
    def test_mixed_impl_parity(self, fn, monkeypatch):
        """"mixed" (fused at high-res stages, XLA below the pixel threshold)
        must match pure XLA.  Threshold lowered so the tiny VAE actually
        switches impls mid-chain."""
        monkeypatch.setattr(vae, "MIXED_MIN_PIXELS", 32 * 32)
        cfg = VAEConfig.tiny()
        p = vae.init_params(jax.random.PRNGKey(0), cfg)
        r = np.random.default_rng(0)
        if fn == "encode":
            x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
            got = vae.encode_moments(p, cfg, x, resnet_impl="mixed")
            want = vae.encode_moments(p, cfg, x, resnet_impl="xla")
        else:
            z = jnp.asarray(r.normal(size=(2, 16, 16, cfg.latent_channels)) * 0.2,
                            jnp.float32)
            got = vae.decode(p, cfg, z, resnet_impl="mixed")
            want = vae.decode(p, cfg, z, resnet_impl="xla")
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    @pytest.mark.parametrize("fn", ["encode", "decode"])
    def test_full_vae_parity(self, fn):
        cfg = VAEConfig.tiny()
        p = vae.init_params(jax.random.PRNGKey(0), cfg)
        r = np.random.default_rng(0)
        if fn == "encode":
            x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
            got = vae.encode_moments(p, cfg, x, resnet_impl="pallas")
            want = vae.encode_moments(p, cfg, x, resnet_impl="xla")
        else:
            z = jnp.asarray(r.normal(size=(2, 16, 16, cfg.latent_channels)) * 0.2,
                            jnp.float32)
            got = vae.decode(p, cfg, z, resnet_impl="pallas")
            want = vae.decode(p, cfg, z, resnet_impl="xla")
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
