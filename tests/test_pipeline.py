"""Pipeline-level tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.pipeline import DiffewsPipeline


@pytest.fixture(scope="module")
def pipe():
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)), ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)), vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    return DiffewsPipeline(bundle)


def _episode(b=1, n=1, s=32, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    sup = rng.uniform(-1, 1, (b, n, s, s, 3)).astype(np.float32)
    msk = np.where(rng.random((b, n, s, s, 3)) > 0.5, 1.0, -1.0).astype(np.float32)
    return q, sup, msk


class TestSegPredict:
    def test_output_uint8_and_threshold_semantics(self, pipe):
        q, sup, msk = _episode()
        out = pipe.predict(q, sup, msk, r_threshold=0.25)
        seg = out.seg_colored
        assert seg.dtype == np.uint8 and seg.shape == (1, 32, 32, 3)
        # threshold must reproduce: to_tensor(/255) -> mean_RGB > 0.25*max
        p = seg.astype(np.float32) / 255.0
        want = p.mean(-1) > p.max() * 0.25
        np.testing.assert_array_equal(out.mask[0], want[0])

    def test_uint8_ingestion_bit_identical(self, pipe):
        """Raw uint8 images + (B,N,H,W) {0,1} masks (in-graph normalization)
        must reproduce the host-normalized float path bit-exactly — the
        device replays the same f32 `/255, -0.5, /0.5` arithmetic."""
        rng = np.random.default_rng(7)
        b, n, s = 2, 2, 32
        q8 = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        s8 = rng.integers(0, 256, (b, n, s, s, 3), dtype=np.uint8)
        m1 = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)
        # host-normalized reference episode (transforms.ImageTransform math)
        qf = (q8.astype(np.float32) / 255.0 - 0.5) / 0.5
        sf = (s8.astype(np.float32) / 255.0 - 0.5) / 0.5
        mf = np.repeat(m1[..., None].astype(np.float32), 3, axis=-1) * 2.0 - 1.0
        a = pipe.predict(q8, s8, m1, r_threshold=0.25)
        ref = pipe.predict(qf, sf, mf, r_threshold=0.25)
        np.testing.assert_array_equal(a.seg_colored, ref.seg_colored)
        np.testing.assert_array_equal(a.mask, ref.mask)

    def test_encode_chunks_same_result(self, pipe):
        """lax.map-chunked VAE encode must reproduce the flat batch —
        images are independent through the VAE (chunking only shrinks the
        compiled graph for huge episode batches)."""
        from diffews_tpu.pipeline import DiffewsPipeline

        q, sup, msk = _episode(b=2, n=1)
        bundle = pipe  # reuse the module fixture's bundle via attributes
        chunked = DiffewsPipeline.__new__(DiffewsPipeline)
        chunked.__dict__.update(pipe.__dict__)
        chunked.encode_chunks = 3  # 2*(1+2*1)=6 images -> 3 chunks of 2
        import jax as _jax
        chunked._predict_jit = _jax.jit(
            chunked._predict_impl, static_argnames=("denoising_steps",))
        a = chunked.predict(q, sup, msk, r_threshold=0.25)
        b = pipe.predict(q, sup, msk, r_threshold=0.25)
        np.testing.assert_array_equal(a.seg_colored, b.seg_colored)

    def test_encode_chunks_auto_splits_huge_batches(self, pipe):
        """encode_chunks=0 (auto) must keep flat batches <=48 images flat
        and split anything larger into the smallest even chunking — the
        5-shot b8 episode graph (88 images) crashed the remote compile
        helper as one flat batch."""
        from diffews_tpu.pipeline import DiffewsPipeline

        auto = DiffewsPipeline.__new__(DiffewsPipeline)
        auto.__dict__.update(pipe.__dict__)
        auto.encode_chunks = 0

        def pick(nimg):  # flat <=48, else <=24-image chunks (measured)
            return 1 if nimg <= 48 else -(-nimg // 24)

        assert pick(24) == 1      # 1-shot b8 stays one flat batch
        assert pick(44) == 1      # 5-shot b4 (flat 44 beats 2x22)
        assert pick(88) == 4      # 5-shot b8 -> 4x22 (2.2x over 2x44)
        assert pick(264) == 11    # 5-shot b24 -> 11x24
        assert pick(53) == 3      # prime counts pad (3x18) instead of
        #                           degrading to 53 per-image encodes
        # numerics equal to the flat path on a tiny episode
        import jax as _jax
        auto._predict_jit = _jax.jit(
            auto._predict_impl, static_argnames=("denoising_steps",))
        q, sup, msk = _episode(b=2, n=1)
        a = auto.predict(q, sup, msk, r_threshold=0.25)
        b = pipe.predict(q, sup, msk, r_threshold=0.25)
        np.testing.assert_array_equal(a.seg_colored, b.seg_colored)

    def test_encode_chunks_non_dividing_pads(self, pipe):
        """A chunk count that doesn't divide the image count zero-pads and
        slices — real-image latents stay bit-identical to the flat batch
        (6 images at encode_chunks=4 -> 4 chunks of 2 with 2 pad images)."""
        from diffews_tpu.pipeline import DiffewsPipeline

        q, sup, msk = _episode(b=2, n=1)
        chunked = DiffewsPipeline.__new__(DiffewsPipeline)
        chunked.__dict__.update(pipe.__dict__)
        chunked.encode_chunks = 4
        import jax as _jax
        chunked._predict_jit = _jax.jit(
            chunked._predict_impl, static_argnames=("denoising_steps",))
        a = chunked.predict(q, sup, msk, r_threshold=0.25)
        b = pipe.predict(q, sup, msk, r_threshold=0.25)
        np.testing.assert_array_equal(a.seg_colored, b.seg_colored)

    def test_decode_resnet_impl_follows_vae_impl(self, pipe):
        """Forced "fused"/"mixed" apply to the DECODER too (a fixed-choice
        flag must not silently split impls); "auto"'s heuristic is
        encode-only by measurement and "int8" lives in the param tree, so
        both decode through XLA."""
        from diffews_tpu.pipeline import DiffewsPipeline

        p = DiffewsPipeline.__new__(DiffewsPipeline)
        for vae_impl, want in [("fused", "fused"), ("mixed", "mixed"),
                               ("auto", "xla"), ("xla", "xla"),
                               ("int8", "xla")]:
            p.vae_impl = vae_impl
            assert p._decode_resnet_impl() == want, vae_impl

    def test_multi_step_equals_single_step(self, pipe):
        """Degenerate scheduler: extra denoise steps are no-ops end-to-end
        (SURVEY.md §3.5) — verified through VAE+UNet+decode."""
        q, sup, msk = _episode(seed=1)
        a = pipe.predict(q, sup, msk, denoising_steps=1).seg_colored
        b = pipe.predict(q, sup, msk, denoising_steps=3).seg_colored
        np.testing.assert_array_equal(a, b)

    def test_reference_call_contract_nchw(self, pipe):
        """__call__ takes [support (B*N,3,H,W), query (B,3,H,W), masks] NCHW
        like the reference harness (`main_oss.py:106-123`)."""
        q, sup, msk = _episode(b=1, n=2)
        out = pipe(
            [np.moveaxis(sup[0], -1, 1), np.moveaxis(q, -1, 1),
             np.moveaxis(msk[0], -1, 1)],
            denoising_steps=1, ensemble_size=1, processing_res=32, mode="seg",
        )
        assert out.seg_colored.shape == (1, 32, 32, 3)

    def test_out_size_nearest_resize(self, pipe):
        q, sup, msk = _episode()
        out = pipe.predict(q, sup, msk, out_size=(48, 48))
        assert out.seg_colored.shape == (1, 48, 48, 3)

    def test_shot_mask_changes_nothing_when_all_valid(self, pipe):
        q, sup, msk = _episode(n=2, seed=2)
        a = pipe.predict(q, sup, msk).seg_colored
        b = pipe.predict(q, sup, msk, shot_mask=np.ones((1, 2), bool)).seg_colored
        np.testing.assert_array_equal(a, b)


class TestDepthPredict:
    def test_depth_output(self, pipe):
        q, sup, msk = _episode(seed=3)
        out = pipe.predict_depth(q, sup, msk)
        assert out.depth_np.shape == (1, 32, 32)
        assert out.depth_np.min() >= 0 and out.depth_np.max() <= 1.0 + 1e-6
        assert out.depth_colored.shape == (1, 32, 32, 3)
        assert out.depth_colored.dtype == np.uint8

    def test_depth_mode_via_call(self, pipe):
        q, sup, msk = _episode(seed=4)
        out = pipe([np.moveaxis(sup[0], -1, 1), np.moveaxis(q, -1, 1),
                    np.moveaxis(msk[0], -1, 1)], mode="depth")
        assert out.depth_np.shape == (1, 32, 32)

    def test_unknown_mode_rejected(self, pipe):
        q, sup, msk = _episode()
        with pytest.raises(NotImplementedError):
            pipe([np.moveaxis(sup[0], -1, 1), np.moveaxis(q, -1, 1),
                  np.moveaxis(msk[0], -1, 1)], mode="sr")


class TestAsyncPredict:
    def test_async_equals_sync(self, pipe):
        q, sup, msk = _episode(b=2, n=2)
        pend = pipe.predict_async(q, sup, msk, out_size=(48, 48), r_threshold=0.25)
        a = pend.result()
        b = pipe.predict(q, sup, msk, out_size=(48, 48), r_threshold=0.25)
        assert np.array_equal(a.seg_colored, b.seg_colored)
        assert np.array_equal(a.mask, b.mask)

    def test_many_in_flight(self, pipe):
        # several dispatches may be pending simultaneously (eval harness
        # --dispatch_ahead); results must match per-episode sync calls
        eps = [_episode(seed=s) for s in range(4)]
        pending = [pipe.predict_async(*e, r_threshold=0.25) for e in eps]
        for e, p in zip(eps, pending):
            want = pipe.predict(*e, r_threshold=0.25)
            got = p.result()
            assert np.array_equal(got.seg_colored, want.seg_colored)


class TestAttnMaskVariant:
    """The experimental attn-mask conditioning variant as a SYSTEM
    (`unet_2d_condition_attn.py` + `attention_processor_attnmask.py`):
    the pipeline path the eval CLI's --attn_mask_variant drives."""

    @pytest.fixture(scope="class")
    def vpipe(self):
        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)),
            ucfg,
            jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)),
            vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        return DiffewsPipeline(bundle, attn_mask_variant=True)

    def test_predict_wellformed_and_mask_conditions(self, vpipe):
        """Output contract holds, and flipping the support mask changes
        the prediction — in this variant the mask reaches the UNet ONLY
        through the per-level attention key biases (it is never
        VAE-encoded), so sensitivity proves the bias path is live."""
        q, sup, msk = _episode(n=2)
        out = vpipe.predict(q, sup, msk, r_threshold=0.25)
        assert out.seg_colored.dtype == np.uint8
        assert out.seg_colored.shape == (1, 32, 32, 3)
        flipped = vpipe.predict(q, sup, -msk, r_threshold=0.25)
        assert not np.array_equal(out.seg_colored, flipped.seg_colored)

    def test_cached_supports_equal_full_episode(self, vpipe):
        """precompute_supports captures the variant's per-level key BIAS
        alongside K/V (the `(k, v, bias)` capture slot), so the cached
        query-only path must reproduce the full joint episode."""
        q, sup, msk = _episode(n=2, seed=3)
        want = vpipe.predict(q, sup, msk, r_threshold=0.25)
        cache = vpipe.precompute_supports(sup, msk)
        got = vpipe.predict_cached(q, cache, r_threshold=0.25)
        # batch-size-dependent XLA fusion rounding can flip quantization-
        # boundary pixels by one uint8 step (test_cached_serving tolerance)
        diff = np.abs(want.seg_colored.astype(np.int32)
                      - got.seg_colored.astype(np.int32))
        assert diff.max() <= 1 and (diff != 0).mean() <= 0.01
        assert (want.mask != got.mask).mean() <= 0.01


def test_mesh_sharded_predict_matches_single_device():
    """Episode batch sharded over an 8-device "data" mesh == single device
    (up to fp reassociation: <=1 uint8 level on isolated pixels)."""
    from diffews_tpu import checkpoint as C2
    from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                     UNetConfig, VAEConfig)
    from diffews_tpu.models import unet as unet_m
    from diffews_tpu.models import vae as vae_m
    from diffews_tpu.parallel import mesh as mesh_lib

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C2.PipelineBundle(
        unet_m.init_params(jax.random.PRNGKey(0), ucfg), ucfg,
        vae_m.init_params(jax.random.PRNGKey(1), vcfg), vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    m = mesh_lib.make_mesh(n_data=8)
    r = np.random.default_rng(0)
    q = r.uniform(-1, 1, (8, 32, 32, 3))
    s = r.uniform(-1, 1, (8, 1, 32, 32, 3))
    k = r.uniform(-1, 1, (8, 1, 32, 32, 3))
    a = DiffewsPipeline(bundle, mesh=m).predict(q, s, k, r_threshold=0.25)
    b = DiffewsPipeline(bundle).predict(q, s, k, r_threshold=0.25)
    assert np.abs(a.seg_colored.astype(int) - b.seg_colored.astype(int)).max() <= 1
    assert np.array_equal(a.mask, b.mask)
