"""W8A8 int8 VAE quantization (`ops/quant.py`, opt-in `vae_impl="int8"`).

The reference has no quantized path (torch fp16 autocast throughout,
`evaluation_util/main_oss.py`); this is the TPU-native extension that
buys the MXU's 2x int8 rate on the frozen VAE (measured 1.32-1.40x per
conv, `tools/tpu_int8_conv_bench.py`).  These tests pin the scheme's
numerics and that the opt-in flag runs end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import layers as L
from diffews_tpu.models import unet, vae
from diffews_tpu.ops.quant import conv2d_int8, quantize_conv_tree


def _conv_params(seed, kh, kw, cin, cout):
    rng = np.random.default_rng(seed)
    return {
        "kernel": jnp.asarray(
            rng.normal(size=(kh, kw, cin, cout)) * 0.05, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(cout,)) * 0.01, jnp.float32),
    }


class TestQuantizeTree:
    def test_eligible_conv_is_rewritten(self):
        p = _conv_params(0, 3, 3, 64, 32)
        q = quantize_conv_tree({"conv1": p})["conv1"]
        assert "kernel" not in q and q["kernel_q"].dtype == jnp.int8
        assert q["w_scale"].shape == (32,)
        assert np.array_equal(np.asarray(q["bias"]), np.asarray(p["bias"]))
        # dequantized weights within one quantization step of the originals
        deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["w_scale"])
        err = np.abs(deq - np.asarray(p["kernel"]))
        assert err.max() <= np.asarray(q["w_scale"]).max() * 0.51

    def test_small_cin_and_1x1_convs_stay_fp(self):
        tree = {
            "conv_in": _conv_params(1, 3, 3, 3, 64),     # cin < 32
            "quant_conv": _conv_params(2, 1, 1, 64, 64),  # 1x1
            "norm": {"scale": jnp.ones((4,))},            # non-conv leaf dict
        }
        q = quantize_conv_tree(tree)
        assert "kernel" in q["conv_in"] and "kernel_q" not in q["conv_in"]
        assert "kernel" in q["quant_conv"] and "kernel_q" not in q["quant_conv"]
        assert np.array_equal(np.asarray(q["norm"]["scale"]), np.ones((4,)))

    def test_conv2d_dispatches_on_kernel_q(self):
        p = _conv_params(3, 3, 3, 32, 32)
        x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 8, 8, 32)),
                        jnp.float32)
        want = L.conv2d(p, x)
        got = L.conv2d(quantize_conv_tree(p), x)
        # smooth gaussian input: W8A8 should land within ~2% relative
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.02, rel


class TestConvInt8:
    @pytest.mark.parametrize("stride,pad", [(1, ((1, 1), (1, 1))),
                                            (2, ((0, 1), (0, 1)))])
    def test_close_to_f32_conv(self, stride, pad):
        p = _conv_params(5, 3, 3, 48, 64)
        q = quantize_conv_tree(p)
        x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 16, 16, 48)),
                        jnp.float32)
        want = L.conv2d(p, x, stride=stride, padding=pad)
        got = conv2d_int8(q, x, stride=stride, padding=pad)
        assert got.dtype == want.dtype and got.shape == want.shape
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.03, rel

    def test_int8_accumulation_is_exact(self):
        """Pure int8 inputs with unit scales reproduce the integer conv."""
        rng = np.random.default_rng(7)
        k8 = rng.integers(-127, 128, (3, 3, 32, 32)).astype(np.int8)
        q = {"kernel_q": jnp.asarray(k8),
             "w_scale": jnp.full((32,), 1.0, jnp.float32)}
        x = jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 32)), jnp.float32)
        got = conv2d_int8(q, x * (1.0 / 127.0) * 127.0)  # amax==127 -> s_a=1
        want = jax.lax.conv_general_dilated(
            x, jnp.asarray(k8, jnp.float32), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestCalibration:
    def test_scales_recorded_per_site_and_static_path_close(self):
        from diffews_tpu.ops.quant import (calibrate_conv_scales,
                                           tag_conv_sites)

        vcfg = VAEConfig.tiny()
        vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(3))
        x = jnp.asarray(
            np.random.default_rng(10).uniform(-1, 1, (2, 32, 32, 3)),
            jnp.float32)

        tagged = tag_conv_sites(vp)
        scales = calibrate_conv_scales(
            lambda p, i: vae.encode_mean_latent(p, vcfg, i,
                                                resnet_impl="xla"),
            tagged, x)
        # every quantizable encoder conv saw an activation
        assert scales and all(v > 0 for v in scales.values())
        assert any(k.startswith("encoder.") for k in scales)

        q = quantize_conv_tree(vp, a_scales=scales)
        # the static a_scale landed in the tree at the recorded sites
        sub = q["encoder"]
        for part in next(iter(scales)).split(".")[1:]:
            sub = sub[part]
        assert "a_scale" in sub
        want = vae.encode_mean_latent(vp, vcfg, x, resnet_impl="xla")
        got = vae.encode_mean_latent(q, vcfg, x, resnet_impl="xla")
        rel = float(jnp.max(jnp.abs(got - want)) /
                    jnp.maximum(jnp.max(jnp.abs(want)), 1e-6))
        assert rel < 0.15, rel

    def test_tagged_tree_runs_normal_conv_outside_calibration(self):
        from diffews_tpu.ops.quant import tag_conv_sites

        p = _conv_params(11, 3, 3, 32, 32)
        x = jnp.asarray(np.random.default_rng(12).normal(size=(1, 8, 8, 32)),
                        jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(L.conv2d(tag_conv_sites({"c": p})["c"], x)),
            np.asarray(L.conv2d(p, x)))


class TestPipelineInt8:
    def test_predict_runs_and_tracks_fp(self):
        from diffews_tpu import checkpoint as C
        from diffews_tpu.pipeline import DiffewsPipeline

        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            jax.jit(lambda r: unet.init_params(r, ucfg))(
                jax.random.PRNGKey(0)), ucfg,
            jax.jit(lambda r: vae.init_params(r, vcfg))(
                jax.random.PRNGKey(1)), vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        rng = np.random.default_rng(8)
        b, n, s = 1, 1, 32
        q = rng.integers(0, 255, (b, s, s, 3), np.uint8)
        sup = rng.integers(0, 255, (b, n, s, s, 3), np.uint8)
        msk = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)

        fp = DiffewsPipeline(bundle).predict(q, sup, msk, r_threshold=0.25)
        i8pipe = DiffewsPipeline(bundle, vae_impl="int8")
        # the tiny VAE's 32-channel stage must actually be quantized
        enc = i8pipe.vae_params["encoder"]
        assert any(
            "kernel_q" in leafdict
            for leafdict in jax.tree_util.tree_leaves(
                enc, is_leaf=lambda x: isinstance(x, dict) and (
                    "kernel" in x or "kernel_q" in x))
            if isinstance(leafdict, dict))
        i8 = i8pipe.predict(q, sup, msk, r_threshold=0.25)
        assert i8.seg_colored.shape == fp.seg_colored.shape
        assert i8.seg_colored.dtype == np.uint8
        # quantization noise must not change most pixels' binary decision
        agree = np.mean(
            (np.asarray(i8.seg_colored) > 127) ==
            (np.asarray(fp.seg_colored) > 127))
        assert agree > 0.95, agree


class TestLinearInt8:
    def test_linear_close_to_fp_and_batched_dims(self):
        from diffews_tpu.models import layers as Lm
        from diffews_tpu.ops.quant import quantize_linear_tree

        rng = np.random.default_rng(20)
        p = {"kernel": jnp.asarray(rng.normal(size=(64, 96)) * 0.05,
                                   jnp.float32),
             "bias": jnp.asarray(rng.normal(size=(96,)) * 0.01, jnp.float32)}
        q = quantize_linear_tree({"attn1.to_q": p},
                                 path_filter=lambda s: True)["attn1.to_q"]
        assert q["kernel_q"].dtype == jnp.int8 and q["w_scale"].shape == (96,)
        x = jnp.asarray(rng.normal(size=(2, 17, 64)), jnp.float32)
        want = Lm.linear(p, x)
        got = Lm.linear(q, x)
        assert got.shape == want.shape and got.dtype == want.dtype
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.03, rel

    def test_default_filter_targets_attn1_ff_only(self):
        from diffews_tpu.ops.quant import unet_attention_linear

        assert unet_attention_linear(
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q")
        assert unet_attention_linear(
            "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj")
        assert unet_attention_linear("up_blocks.1.attentions.0.proj_out")
        assert not unet_attention_linear(
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k")
        assert not unet_attention_linear("time_embedding.linear_1")

    def test_unet_forward_with_quantized_linears_close_to_fp(self):
        from diffews_tpu.ops.quant import (calibrate_conv_scales,
                                           quantize_linear_tree,
                                           tag_linear_sites)

        ucfg = UNetConfig.tiny()
        up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(4))
        rng = np.random.default_rng(21)
        lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        ref = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 2, ucfg.cross_attention_dim)),
                          jnp.float32)

        def run(p, lat, ref, ctx):
            return unet.forward(p, ucfg, lat, 1, ctx, ref_sample=ref)

        scales = calibrate_conv_scales(run, tag_linear_sites(up),
                                       lat, ref, ctx)
        assert scales and all(".attn1." in k or ".ff." in k
                              or k.endswith("proj_in")
                              or k.endswith("proj_out") for k in scales)
        q = quantize_linear_tree(up, a_scales=scales)
        want = run(up, lat, ref, ctx)
        got = run(q, lat, ref, ctx)
        rel = float(jnp.max(jnp.abs(got - want)) /
                    jnp.maximum(jnp.max(jnp.abs(want)), 1e-6))
        assert rel < 0.2, rel

    def test_pipeline_unet_int8_flag_runs(self):
        from diffews_tpu import checkpoint as C
        from diffews_tpu.pipeline import DiffewsPipeline

        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            jax.jit(lambda r: unet.init_params(r, ucfg))(
                jax.random.PRNGKey(0)), ucfg,
            jax.jit(lambda r: vae.init_params(r, vcfg))(
                jax.random.PRNGKey(1)), vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        rng = np.random.default_rng(22)
        b, n, s = 1, 1, 32
        q = rng.integers(0, 255, (b, s, s, 3), np.uint8)
        sup = rng.integers(0, 255, (b, n, s, s, 3), np.uint8)
        msk = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)
        fp = DiffewsPipeline(bundle).predict(q, sup, msk, r_threshold=0.25)
        i8 = DiffewsPipeline(bundle, vae_impl="int8", unet_int8=True).predict(
            q, sup, msk, r_threshold=0.25)
        assert i8.seg_colored.shape == fp.seg_colored.shape
        agree = np.mean((np.asarray(i8.seg_colored) > 127) ==
                        (np.asarray(fp.seg_colored) > 127))
        assert agree > 0.9, agree


class TestInt8Composition:
    def test_int8_composes_with_shot_parallel_mesh(self):
        """vae_impl="int8" + shot_mesh: the quantized tree (int8 leaves +
        static scales) must replicate over the mesh and serve sharded
        episodes; prediction matches the single-device int8 pipeline."""
        from jax.sharding import Mesh

        from diffews_tpu import checkpoint as C
        from diffews_tpu.pipeline import DiffewsPipeline

        if jax.device_count() < 4:
            pytest.skip("needs >=4 devices")
        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            jax.jit(lambda r: unet.init_params(r, ucfg))(
                jax.random.PRNGKey(0)), ucfg,
            jax.jit(lambda r: vae.init_params(r, vcfg))(
                jax.random.PRNGKey(1)), vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("shots",))
        rng = np.random.default_rng(13)
        b, n, s = 1, 4, 32
        q = rng.integers(0, 255, (b, s, s, 3), np.uint8)
        sup = rng.integers(0, 255, (b, n, s, s, 3), np.uint8)
        msk = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)

        base = DiffewsPipeline(bundle, vae_impl="int8").predict(
            q, sup, msk, r_threshold=0.25)
        sharded = DiffewsPipeline(bundle, vae_impl="int8",
                                  shot_mesh=mesh).predict(
            q, sup, msk, r_threshold=0.25)
        np.testing.assert_allclose(
            np.asarray(sharded.seg_colored).astype(np.int32),
            np.asarray(base.seg_colored).astype(np.int32), atol=1)


class TestVAEInt8Latents:
    def test_encode_latents_close_to_fp(self):
        vcfg = VAEConfig.tiny()
        vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(2))
        x = jnp.asarray(
            np.random.default_rng(9).uniform(-1, 1, (2, 32, 32, 3)),
            jnp.float32)
        want = vae.encode_mean_latent(vp, vcfg, x, resnet_impl="xla")
        got = vae.encode_mean_latent(
            quantize_conv_tree(vp), vcfg, x, resnet_impl="xla")
        rel = float(jnp.max(jnp.abs(got - want)) /
                    jnp.maximum(jnp.max(jnp.abs(want)), 1e-6))
        assert rel < 0.15, rel
