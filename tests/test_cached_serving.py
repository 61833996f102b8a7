"""Support-KV cache serving: precompute a support set once, serve queries.

The reference recomputes the support ("reference") UNet pass and the
support/mask VAE encodes for every episode even with a fixed support set
(the k/v bank is cleared after each step,
`marigold_pipeline_rgb_latent_noise.py:715,725`).  The cache path must be
numerically identical to the joint forward: the support stream is
batch-independent of the query stream, so captured K/V equal a live run's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.pipeline import DiffewsPipeline

ufwd = jax.jit(unet.forward, static_argnames=("cfg", "attn_impl", "remat"))


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.fixture(scope="module")
def unet_setup():
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(1))
    return cfg, params


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


class TestUNetCaptureUse:
    """Model-level: capture + cached use must equal the joint forward."""

    def test_cached_equals_joint(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(2, 8, 8, 4, seed=0)
        ctx = _rand(2, 2, cfg.cross_attention_dim, seed=1)
        ref = _rand(2, 3, 8, 8, 8, seed=2)
        joint = ufwd(params, cfg, x, 1, ctx, ref_sample=ref)

        @jax.jit
        def capture(params, ref, ctx):
            cap = []
            dummy = jnp.zeros((2, 8, 8, 4), ref.dtype)
            unet.forward(params, cfg, dummy, 1, ctx, ref_sample=ref,
                         kv_capture=cap)
            return tuple(cap)

        entries = capture(params, ref, ctx)
        use = jax.jit(lambda p, x, ctx, e: unet.forward(
            p, cfg, x, 1, ctx, kv_cache=e))(params, x, ctx, entries)
        np.testing.assert_allclose(np.asarray(use), np.asarray(joint),
                                   rtol=1e-5, atol=1e-6)

    def test_cached_with_shot_mask_equals_joint(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=3)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=4)
        ref = _rand(1, 3, 8, 8, 8, seed=5)
        sm = jnp.asarray([[True, True, False]])
        joint = ufwd(params, cfg, x, 1, ctx, ref_sample=ref, shot_mask=sm)

        @jax.jit
        def capture(params, ref, ctx):
            cap = []
            dummy = jnp.zeros((1, 8, 8, 4), ref.dtype)
            unet.forward(params, cfg, dummy, 1, ctx, ref_sample=ref,
                         kv_capture=cap)
            return tuple(cap)

        entries = capture(params, ref, ctx)
        use = jax.jit(lambda p, x, ctx, e, sm: unet.forward(
            p, cfg, x, 1, ctx, kv_cache=e, shot_mask=sm))(
            params, x, ctx, entries, sm)
        np.testing.assert_allclose(np.asarray(use), np.asarray(joint),
                                   rtol=1e-5, atol=1e-6)

    def test_cache_broadcasts_over_query_batch(self, unet_setup):
        """A batch-1 cache serves a larger query batch row-for-row."""
        cfg, params = unet_setup
        ref = _rand(1, 2, 8, 8, 8, seed=6)
        ctx1 = _rand(1, 2, cfg.cross_attention_dim, seed=7)

        @jax.jit
        def capture(params, ref, ctx):
            cap = []
            dummy = jnp.zeros((1, 8, 8, 4), ref.dtype)
            unet.forward(params, cfg, dummy, 1, ctx, ref_sample=ref,
                         kv_capture=cap)
            return tuple(cap)

        entries = capture(params, ref, ctx1)
        xs = _rand(3, 8, 8, 4, seed=8)
        ctx3 = jnp.broadcast_to(ctx1, (3,) + ctx1.shape[1:])
        batched = jax.jit(lambda p, x, ctx, e: unet.forward(
            p, cfg, x, 1, ctx, kv_cache=e))(params, xs, ctx3, entries)
        for i in range(3):
            joint = ufwd(params, cfg, xs[i:i + 1], 1, ctx1,
                         ref_sample=ref)
            np.testing.assert_allclose(np.asarray(batched[i:i + 1]),
                                       np.asarray(joint),
                                       rtol=1e-5, atol=1e-6)

    def test_attn_mask_variant_cached_equals_joint(self, unet_setup):
        """The attn-mask conditioning variant's per-level key biases are
        captured with the K/V and reapplied from the cache."""
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4, seed=9)
        ctx = _rand(1, 2, cfg.cross_attention_dim, seed=10)
        ref4 = _rand(1, 1, 8, 8, 4, seed=11)
        mask = jnp.asarray(
            (np.random.default_rng(12).random((1, 1, 64, 64)) > 0.5)
            .astype(np.float32))
        joint = ufwd(params, cfg, x, 1, ctx, ref_sample=ref4, ref_mask=mask)

        @jax.jit
        def capture(params, ref, ctx, mask):
            cap = []
            dummy = jnp.zeros((1, 8, 8, 4), ref.dtype)
            unet.forward(params, cfg, dummy, 1, ctx, ref_sample=ref,
                         ref_mask=mask, kv_capture=cap)
            return tuple(cap)

        entries = capture(params, ref4, ctx, mask)
        use = jax.jit(lambda p, x, ctx, e: unet.forward(
            p, cfg, x, 1, ctx, kv_cache=e))(params, x, ctx, entries)
        np.testing.assert_allclose(np.asarray(use), np.asarray(joint),
                                   rtol=1e-5, atol=1e-6)

    def test_guards(self, unet_setup):
        cfg, params = unet_setup
        x = _rand(1, 8, 8, 4)
        ctx = _rand(1, 2, cfg.cross_attention_dim)
        ref = _rand(1, 1, 8, 8, 8)
        with pytest.raises(ValueError, match="kv_capture requires"):
            unet.forward(params, cfg, x, 1, ctx, kv_capture=[])
        with pytest.raises(ValueError, match="not both"):
            unet.forward(params, cfg, x, 1, ctx, ref_sample=ref,
                         kv_cache=())
        with pytest.raises(ValueError, match="remat"):
            unet.forward(params, cfg, x, 1, ctx, ref_sample=ref,
                         kv_capture=[], remat=True)


def _assert_uint8_close(a, b, max_frac=0.01):
    """Same math, different VAE encode batch size: XLA's batch-dependent
    fusion rounding may flip quantization-boundary pixels by 1 uint8 step
    (observed <=1/3072 on CPU; see predict_cached_async docstring)."""
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()} > 1"
    assert (diff != 0).mean() <= max_frac, (
        f"{(diff != 0).mean():.4f} of pixels differ (allowed {max_frac})")


class TestPipelineCachedServing:
    def test_predict_cached_equals_predict(self, pipe):
        q, sup, msk = _episode(b=2, n=2, seed=0)
        full = pipe.predict(q, sup, msk, r_threshold=0.25)
        cache = pipe.precompute_supports(sup, msk)
        cached = pipe.predict_cached(q, cache, r_threshold=0.25)
        _assert_uint8_close(cached.seg_colored, full.seg_colored)
        assert (cached.mask != full.mask).mean() <= 0.01

    def test_predict_cached_with_padded_shots(self, pipe):
        q, sup, msk = _episode(b=1, n=3, seed=1)
        sm = np.array([[True, True, False]])
        full = pipe.predict(q, sup, msk, shot_mask=jnp.asarray(sm),
                            r_threshold=0.25)
        cache = pipe.precompute_supports(sup, msk, shot_mask=sm)
        cached = pipe.predict_cached(q, cache, r_threshold=0.25)
        _assert_uint8_close(cached.seg_colored, full.seg_colored)

    def test_one_support_set_many_queries(self, pipe):
        """The headline serving pattern: one batch-1 support set, a batch
        of queries — each row must equal its own full episode."""
        _, sup, msk = _episode(b=1, n=1, seed=2)
        rng = np.random.default_rng(3)
        qs = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
        cache = pipe.precompute_supports(sup, msk)
        batched = pipe.predict_cached(qs, cache)
        for i in range(3):
            full = pipe.predict(qs[i:i + 1], sup, msk)
            _assert_uint8_close(batched.seg_colored[i:i + 1],
                                full.seg_colored)

    def test_uint8_ingestion(self, pipe):
        """Raw uint8 supports/queries + {0,1} masks through the cache path
        equal the host-normalized float path bit-exactly."""
        rng = np.random.default_rng(4)
        b, n, s = 1, 2, 32
        q8 = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        s8 = rng.integers(0, 256, (b, n, s, s, 3), dtype=np.uint8)
        m1 = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)
        qf = (q8.astype(np.float32) / 255.0 - 0.5) / 0.5
        sf = (s8.astype(np.float32) / 255.0 - 0.5) / 0.5
        mf = np.repeat(m1[..., None].astype(np.float32), 3, axis=-1) * 2.0 - 1.0
        a = pipe.predict_cached(q8, pipe.precompute_supports(s8, m1))
        ref = pipe.predict_cached(qf, pipe.precompute_supports(sf, mf))
        np.testing.assert_array_equal(a.seg_colored, ref.seg_colored)

    def test_multistep_rejected(self, pipe):
        q, sup, msk = _episode()
        cache = pipe.precompute_supports(sup, msk)
        with pytest.raises(NotImplementedError, match="one-step"):
            pipe.predict_cached(q, cache, denoising_steps=2)

    def test_batch_mismatch_rejected(self, pipe):
        q, sup, msk = _episode(b=2, n=1, seed=5)
        cache = pipe.precompute_supports(sup, msk)  # batch 2
        with pytest.raises(ValueError, match="cache batch"):
            pipe.predict_cached(q[:1], cache)


class TestDataParallelCachedServing:
    """Cached serving on a ("data",) episode mesh (--num_data_shards): the
    query batch commits to P("data") and the cache entries propagate the
    mesh layout, so multi-chip cached serving is an explicit sharding, not
    whatever GSPMD guesses from uncommitted inputs."""

    def _dp_pipe(self, n_data=2):
        from diffews_tpu.parallel.mesh import make_mesh

        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)),
            ucfg,
            jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)),
            vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        return DiffewsPipeline(bundle, mesh=make_mesh(n_data=n_data))

    def test_broadcast_cache_matches_unsharded(self, pipe):
        dp = self._dp_pipe()
        _, sup, msk = _episode(b=1, n=2, seed=7)
        rng = np.random.default_rng(8)
        qs = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
        cache_dp = dp.precompute_supports(sup, msk)
        cache_1 = pipe.precompute_supports(sup, msk)
        got = dp.predict_cached(qs, cache_dp, r_threshold=0.25)
        want = pipe.predict_cached(qs, cache_1, r_threshold=0.25)
        _assert_uint8_close(got.seg_colored, want.seg_colored)
        # the query really is committed to the data mesh before dispatch:
        # the batch-1 cache entries replicate over it
        sh = jax.tree_util.tree_leaves(cache_dp.entries)[0].sharding
        assert sh.is_fully_replicated

    def test_rowwise_cache_shards_batch(self, pipe):
        dp = self._dp_pipe()
        q, sup, msk = _episode(b=2, n=1, seed=9)
        cache_dp = dp.precompute_supports(sup, msk)
        cache_1 = pipe.precompute_supports(sup, msk)
        got = dp.predict_cached(q, cache_dp, r_threshold=0.25)
        want = pipe.predict_cached(q, cache_1, r_threshold=0.25)
        _assert_uint8_close(got.seg_colored, want.seg_colored)
        sh = jax.tree_util.tree_leaves(cache_dp.entries)[0].sharding
        assert not sh.is_fully_replicated  # batch dim carries P("data")


class TestDeviceMask:
    """pipeline.device_mask_from_seg: the in-graph threshold (serving's
    masks-only transfer path) must reproduce PendingSeg.result()'s host
    formula exactly."""

    def test_unit_matches_host_formula(self):
        from diffews_tpu import pipeline as P

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (4, 24, 24, 3), dtype=np.uint8)
        for r_thr, thr in [(0.25, 0.0), (0.5, 0.0), (0.0, 0.4)]:
            host = P.PendingSeg(jnp.asarray(img), r_thr, thr).result().mask
            rel = r_thr > 0
            dev = np.asarray(P.device_mask_from_seg(
                jnp.asarray(img), float(r_thr if rel else thr), rel))
            np.testing.assert_array_equal(dev, host)

    def test_predict_cached_mask_on_device(self, pipe):
        q, sup, msk = _episode(b=2, n=1, seed=5)
        cache = pipe.precompute_supports(sup, msk)
        host = pipe.predict_cached_async(q, cache, r_threshold=0.25).result()
        dev = pipe.predict_cached_async(
            q, cache, r_threshold=0.25, mask_on_device=True).result(
                need_seg=False)
        np.testing.assert_array_equal(dev.mask, host.mask)
        assert dev.seg_colored is None  # masks-only: no seg transfer
        # need_seg=True still ships the identical seg image
        both = pipe.predict_cached_async(
            q, cache, r_threshold=0.25, mask_on_device=True).result()
        np.testing.assert_array_equal(both.seg_colored, host.seg_colored)

    def test_predict_async_mask_on_device_absolute_thr(self, pipe):
        q, sup, msk = _episode(b=1, n=1, seed=6)
        host = pipe.predict_async(q, sup, msk, threshold=0.4).result()
        dev = pipe.predict_async(q, sup, msk, threshold=0.4,
                                 mask_on_device=True).result(need_seg=False)
        np.testing.assert_array_equal(dev.mask, host.mask)
