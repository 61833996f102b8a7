"""Shot-parallel (sequence-parallel KV-fusion) attention on an 8-device mesh.

The reference folds every support shot into one single-GPU xformers KV
sequence (`diffews/models/attention_processor.py:256-267`); its many-shot
ceiling is that GPU's memory.  `shot_parallel_fused_kv_attention` shards the
shots over a mesh axis and merges per-device partial softmaxes exactly via a
log-sum-exp psum; these tests pin the merge against the single-device op and
the whole UNet joint pass against its unsharded self on the virtual CPU mesh
(SURVEY.md §4's substitute for distributed tests).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from diffews_tpu.ops.attention import (
    fused_kv_attention,
    shot_parallel_fused_kv_attention,
)

DEVS = 8


def _mesh():
    return Mesh(np.asarray(jax.devices()[:DEVS]).reshape(DEVS), ("shots",))


def _proj(seed, shape):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


class TestOpLevel:
    B, S, SR, H, D = 2, 16, 12, 3, 8
    N = DEVS * 2  # 2 shots per device

    def _inputs(self):
        b, s, sr, h, d, n = self.B, self.S, self.SR, self.H, self.D, self.N
        return (_proj(0, (b, s, h, d)), _proj(1, (b, s, h, d)),
                _proj(2, (b, s, h, d)), _proj(3, (b, n, sr, h, d)),
                _proj(4, (b, n, sr, h, d)))

    def _run_sharded(self, q, k_own, v_own, k_sup, v_sup, shot_mask=None,
                     support_bias=None):
        mesh = _mesh()
        in_specs = [P(), P(), P(), P(None, "shots"), P(None, "shots")]
        args = [q, k_own, v_own, k_sup, v_sup]
        kw = {}
        if shot_mask is not None:
            in_specs.append(P(None, "shots"))
            args.append(shot_mask)
            kw["with_mask"] = True
        if support_bias is not None:
            in_specs.append(P(None, "shots"))
            # (B, N, SR) so the shot dim shards; flattened inside
            args.append(support_bias)
            kw["with_bias"] = True

        def f(*local):
            q, ko, vo, ks, vs = local[:5]
            i = 5
            sm = None
            sb = None
            if kw.get("with_mask"):
                sm = local[i]
                i += 1
            if kw.get("with_bias"):
                sb = local[i].reshape(local[i].shape[0], -1)
            return shot_parallel_fused_kv_attention(
                q, ko, vo, ks, vs, axis_name="shots",
                shot_mask=sm, support_bias=sb)

        return shard_map(f, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=P(), check_rep=False)(*args)

    def test_matches_single_device(self):
        q, ko, vo, ks, vs = self._inputs()
        want = fused_kv_attention(q, ko, vo, ks, vs)
        got = self._run_sharded(q, ko, vo, ks, vs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_with_padded_shots(self):
        """Some shots invalid — including devices whose ENTIRE shard is
        padding (their partial weight must underflow to exactly zero)."""
        q, ko, vo, ks, vs = self._inputs()
        mask = np.ones((self.B, self.N), bool)
        mask[:, 6:] = False  # devices 3..7 fully masked
        mask = jnp.asarray(mask)
        want = fused_kv_attention(q, ko, vo, ks, vs, shot_mask=mask)
        got = self._run_sharded(q, ko, vo, ks, vs, shot_mask=mask)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_with_support_bias(self):
        """The attn-mask variant's (1-mask)*-1e4 support-key bias."""
        q, ko, vo, ks, vs = self._inputs()
        m = np.random.default_rng(9).random((self.B, self.N, self.SR)) > 0.4
        bias = jnp.asarray((1.0 - m.astype(np.float32)) * -10000.0)
        want = fused_kv_attention(
            q, ko, vo, ks, vs,
            support_bias=bias.reshape(self.B, -1))
        got = self._run_sharded(q, ko, vo, ks, vs, support_bias=bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_pallas_impl_matches_xla_impl(self):
        """The flash-kernel (interpret-mode) partials merge to the same
        result as the dense partials."""
        q, ko, vo, ks, vs = self._inputs()
        mesh = _mesh()

        def run(impl):
            def f(q, ko, vo, ks, vs):
                return shot_parallel_fused_kv_attention(
                    q, ko, vo, ks, vs, axis_name="shots", impl=impl)
            return shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(), P(), P(None, "shots"), P(None, "shots")),
                out_specs=P(), check_rep=False)(q, ko, vo, ks, vs)

        np.testing.assert_allclose(np.asarray(run("pallas")),
                                   np.asarray(run("xla")),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_flow_through_psum(self):
        """impl='xla' is differentiable end to end (training with sharded
        shots): grads wrt the local support shard match the single-device
        grads of the same slice."""
        q, ko, vo, ks, vs = self._inputs()
        mesh = _mesh()

        def loss_sharded(ks, vs):
            def f(q, ko, vo, ks, vs):
                out = shot_parallel_fused_kv_attention(
                    q, ko, vo, ks, vs, axis_name="shots")
                return jax.lax.psum((out ** 2).sum() / DEVS, "shots")
            return shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(), P(), P(None, "shots"), P(None, "shots")),
                out_specs=P(), check_rep=False)(q, ko, vo, ks, vs)

        def loss_single(ks, vs):
            return (fused_kv_attention(q, ko, vo, ks, vs) ** 2).sum()

        g_sh = jax.grad(loss_sharded, (0, 1))(ks, vs)
        g_1d = jax.grad(loss_single, (0, 1))(ks, vs)
        for a, b in zip(g_sh, g_1d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestPipelineLevel:
    def test_shot_mesh_predict_matches_single_device(self):
        """Full episode predict with shot_mesh: 8 shots sharded over the
        8-device mesh vs the unsharded pipeline.  Decoded uint8 images may
        differ by 1 count from the differing softmax reduction order."""
        import jax as _jax

        from diffews_tpu import checkpoint as C
        from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                         UNetConfig, VAEConfig)
        from diffews_tpu.models import unet, vae
        from diffews_tpu.pipeline import DiffewsPipeline

        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            _jax.jit(lambda r: unet.init_params(r, ucfg))(
                _jax.random.PRNGKey(0)), ucfg,
            _jax.jit(lambda r: vae.init_params(r, vcfg))(
                _jax.random.PRNGKey(1)), vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        base = DiffewsPipeline(bundle)
        sharded = DiffewsPipeline(bundle, shot_mesh=_mesh())

        b, n, s = 1, DEVS, 32
        rng = np.random.default_rng(3)
        q = rng.integers(0, 255, (b, s, s, 3), np.uint8)
        sup = rng.integers(0, 255, (b, n, s, s, 3), np.uint8)
        msk = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)
        sm = np.ones((b, n), bool)
        sm[:, -2:] = False

        a = base.predict(q, sup, msk, shot_mask=jnp.asarray(sm),
                         r_threshold=0.25)
        c = sharded.predict(q, sup, msk, shot_mask=jnp.asarray(sm),
                            r_threshold=0.25)
        np.testing.assert_allclose(
            np.asarray(a.seg_colored).astype(np.int32),
            np.asarray(c.seg_colored).astype(np.int32), atol=1)

    def test_2d_data_x_shots_mesh_matches_single_device(self):
        """Composed serving mesh: batch 4 over a 4-wide "data" axis AND
        2 shots over a 2-wide "shots" axis (8 devices total) must match
        the unsharded pipeline — the softmax-merge psum rides only the
        "shots" axis, so the axes are independent."""
        import jax as _jax

        from diffews_tpu import checkpoint as C
        from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                         UNetConfig, VAEConfig)
        from diffews_tpu.models import unet, vae
        from diffews_tpu.parallel.mesh import make_shot_mesh
        from diffews_tpu.pipeline import DiffewsPipeline

        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            _jax.jit(lambda r: unet.init_params(r, ucfg))(
                _jax.random.PRNGKey(0)), ucfg,
            _jax.jit(lambda r: vae.init_params(r, vcfg))(
                _jax.random.PRNGKey(1)), vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        mesh2d = make_shot_mesh(2, n_data=4)
        assert mesh2d.axis_names == ("data", "shots")
        base = DiffewsPipeline(bundle)
        sharded = DiffewsPipeline(bundle, shot_mesh=mesh2d)

        b, n, s = 4, 2, 32
        rng = np.random.default_rng(11)
        q = rng.integers(0, 255, (b, s, s, 3), np.uint8)
        sup = rng.integers(0, 255, (b, n, s, s, 3), np.uint8)
        msk = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)
        sm = np.ones((b, n), bool)
        sm[1, 1] = False

        a = base.predict(q, sup, msk, shot_mask=jnp.asarray(sm),
                         r_threshold=0.25)
        c = sharded.predict(q, sup, msk, shot_mask=jnp.asarray(sm),
                            r_threshold=0.25)
        np.testing.assert_allclose(
            np.asarray(a.seg_colored).astype(np.int32),
            np.asarray(c.seg_colored).astype(np.int32), atol=1)

    def test_shot_mesh_rejects_indivisible_nshot(self):
        import jax as _jax

        from diffews_tpu import checkpoint as C
        from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                         UNetConfig, VAEConfig)
        from diffews_tpu.models import unet, vae
        from diffews_tpu.pipeline import DiffewsPipeline

        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        bundle = C.PipelineBundle(
            _jax.jit(lambda r: unet.init_params(r, ucfg))(
                _jax.random.PRNGKey(0)), ucfg,
            _jax.jit(lambda r: vae.init_params(r, vcfg))(
                _jax.random.PRNGKey(1)), vcfg,
            None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
        )
        pipe = DiffewsPipeline(bundle, shot_mesh=_mesh())
        rng = np.random.default_rng(0)
        q = rng.integers(0, 255, (1, 32, 32, 3), np.uint8)
        sup = rng.integers(0, 255, (1, 3, 32, 32, 3), np.uint8)
        msk = (rng.random((1, 3, 32, 32)) > 0.5).astype(np.uint8)
        with pytest.raises(ValueError, match="divide"):
            pipe.predict(q, sup, msk, r_threshold=0.25)


class TestUNetLevel:
    def test_joint_forward_matches_unsharded(self):
        """Tiny UNet: full joint pass with 8 shots sharded 1/device equals
        the single-device joint pass (replicated query stream, local
        support streams, lse-merged fused attention at every level)."""
        from diffews_tpu.configs import UNetConfig
        from diffews_tpu.models import unet

        cfg = UNetConfig.tiny()
        params = jax.jit(lambda r: unet.init_params(r, cfg))(
            jax.random.PRNGKey(0))
        b, n, s = 2, DEVS, 16
        rng = np.random.default_rng(5)
        sample = jnp.asarray(rng.normal(size=(b, s, s, cfg.in_channels)),
                             jnp.float32)
        ref = jnp.asarray(
            rng.normal(size=(b, n, s, s, cfg.ref_in_channels)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(b, 2, cfg.cross_attention_dim)),
                          jnp.float32)
        mask = np.ones((b, n), bool)
        mask[:, -3:] = False  # padded shots, incl. whole devices
        mask = jnp.asarray(mask)

        want = unet.forward(params, cfg, sample, 1, ctx, ref_sample=ref,
                            shot_mask=mask)

        mesh = _mesh()
        fwd = functools.partial(unet.forward, cfg=cfg, timestep=1,
                                attn_impl="xla", shot_axis="shots")

        def f(params, sample, ctx, ref, mask):
            return fwd(params, sample=sample, context=ctx, ref_sample=ref,
                       shot_mask=mask)

        got = shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, "shots"), P(None, "shots")),
            out_specs=P(), check_rep=False,
        )(params, sample, ctx, ref, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)

    def test_attn_mask_variant_matches_unsharded(self):
        """The experimental attn-mask conditioning under shot sharding."""
        from diffews_tpu.configs import UNetConfig
        from diffews_tpu.models import unet

        cfg = UNetConfig.tiny()
        params = jax.jit(lambda r: unet.init_params(r, cfg))(
            jax.random.PRNGKey(1))
        b, n, s = 1, DEVS, 16
        rng = np.random.default_rng(6)
        sample = jnp.asarray(rng.normal(size=(b, s, s, cfg.in_channels)),
                             jnp.float32)
        ref = jnp.asarray(
            rng.normal(size=(b, n, s, s, cfg.in_channels)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(b, 2, cfg.cross_attention_dim)),
                          jnp.float32)
        rmask = jnp.asarray(
            (rng.random((b, n, s * 8, s * 8)) > 0.5).astype(np.float32))

        want = unet.forward(params, cfg, sample, 1, ctx, ref_sample=ref,
                            ref_mask=rmask)

        mesh = _mesh()

        def f(params, sample, ctx, ref, rmask):
            return unet.forward(params, cfg, sample, 1, ctx,
                                ref_sample=ref, ref_mask=rmask,
                                shot_axis="shots")

        got = shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, "shots"), P(None, "shots")),
            out_specs=P(), check_rep=False,
        )(params, sample, ctx, ref, rmask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)
