"""Model-level pin: the joint single-pass UNet == literal two-pass KV banks.

The reference runs TWO stateful UNet dispatches: a "reference" pass over the
support latents that fills per-layer `k_bank`/`v_bank` slots while
self-attending over its own tokens, then a "target" pass over the query
latent whose self-attentions concatenate [own K/V ‖ bank folded
batch->sequence] (`diffews/models/attention_processor.py:251-271`,
`unet_2d_condition.py:656-664`, and the pipeline's two calls at
`marigold_pipeline_rgb_latent_noise.py:706-725`).  Our `unet.forward` fuses
both dispatches into one batch-concatenated functional pass.

This file re-implements the reference semantics LITERALLY (two dispatches, a
mutable bank list in layer-call order, separate hidden states and skip
stacks per pass) on the tiny config and asserts the joint forward matches —
including n-shot>1 shot folding, padded-shot masking, per-shot contexts,
and the attn-mask conditioning variant's per-level key biases
(`attention_processor_attnmask.py:213-244`, `unet_2d_condition_attn.py:645-666`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import layers as L
from diffews_tpu.models import unet
from diffews_tpu.ops.attention import NEG_INF, dense_attention, merge_heads, split_heads
from diffews_tpu.ops.resize import nearest_resize

ATTN_EPS = 1e-6


def _two_pass_forward(params, cfg: UNetConfig, sample, timestep, context,
                      ref_sample, ref_context=None, shot_mask=None,
                      ref_mask=None):
    """Literal two-dispatch emulation of the reference UNet semantics."""
    b = sample.shape[0]
    n = ref_sample.shape[1]
    ref_flat = ref_sample.reshape((b * n,) + ref_sample.shape[2:])
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    n_levels = cfg.num_levels

    bank = []  # [(k, v)] appended by the ref pass in layer-call order

    # attn-mask variant: per-level additive biases on the banked keys
    sup_biases = {}
    if ref_mask is not None:
        flat_mask = ref_mask.reshape((b * n,) + ref_mask.shape[2:])
        for sid in range(n_levels):
            gh = sample.shape[1] // (2**sid)
            gw = sample.shape[2] // (2**sid)
            m = nearest_resize(flat_mask.astype(jnp.float32), (gh, gw))
            sup_biases[sid] = (1.0 - m.reshape(b, n * gh * gw)) * -10000.0

    def attn1(p, h, heads, mode, sid):
        q = split_heads(L.linear(p["to_q"], h), heads)
        k = split_heads(L.linear(p["to_k"], h), heads)
        v = split_heads(L.linear(p["to_v"], h), heads)
        if mode == "store":
            bank.append((k, v))  # attention_processor.py:252-253 first call
            out = dense_attention(q, k, v)
        else:
            kb, vb = bank.pop(0)  # same slot, second call: concat after own
            s_ref, hd = kb.shape[1], kb.shape[-1]
            kk = jnp.concatenate([k, kb.reshape(b, n * s_ref, heads, hd)], 1)
            vv = jnp.concatenate([v, vb.reshape(b, n * s_ref, heads, hd)], 1)
            bias = None
            sup = None
            if shot_mask is not None:
                ok = jnp.repeat(shot_mask, s_ref, axis=1)
                sup = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
            if sid in sup_biases:
                sb = sup_biases[sid].astype(jnp.float32)
                sup = sb if sup is None else sup + sb
            if sup is not None:
                own = jnp.zeros((b, h.shape[1]), jnp.float32)
                bias = jnp.concatenate([own, sup], 1)[:, None, None, :]
            out = dense_attention(q, kk, vv, kv_bias=bias)
        return L.linear(p["to_out"]["0"], merge_heads(out))

    def attn2(p, h, ctx, heads):
        q = split_heads(L.linear(p["to_q"], h), heads)
        k = split_heads(L.linear(p["to_k"], ctx), heads)
        v = split_heads(L.linear(p["to_v"], ctx), heads)
        return L.linear(p["to_out"]["0"], merge_heads(dense_attention(q, k, v)))

    def transformer2d(p, x, ctx, heads, mode, sid):
        bb, hh, ww, c = x.shape
        residual = x
        h = L.group_norm(p["norm"], x, groups=g, eps=ATTN_EPS)
        h = h.reshape(bb, hh * ww, c)
        if cfg.use_linear_projection:
            h = L.linear(p["proj_in"], h)
        else:
            h = L.conv2d(p["proj_in"], h.reshape(bb, hh, ww, c), padding=0)
            h = h.reshape(bb, hh * ww, c)
        for i in range(cfg.transformer_layers_per_block):
            bp = p["transformer_blocks"][str(i)]
            h = h + attn1(bp["attn1"], L.layer_norm(bp["norm1"], h), heads, mode, sid)
            h = h + attn2(bp["attn2"], L.layer_norm(bp["norm2"], h), ctx, heads)
            h = h + L.geglu_ff(bp["ff"], L.layer_norm(bp["norm3"], h))
        if cfg.use_linear_projection:
            h = L.linear(p["proj_out"], h).reshape(bb, hh, ww, c)
        else:
            h = L.conv2d(p["proj_out"], h.reshape(bb, hh, ww, c), padding=0)
        return h + residual

    def dispatch(x, ctx, conv_in_key, mode):
        rows = x.shape[0]
        ts = jnp.asarray(timestep, dtype=jnp.float32).reshape(-1)
        t_emb = L.timestep_embedding(
            ts, cfg.block_out_channels[0], flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift, dtype=x.dtype,
        )
        emb = L.time_embedding_mlp(params["time_embedding"], t_emb)
        emb = jnp.broadcast_to(emb, (rows, emb.shape[1]))

        h = L.conv2d(params[conv_in_key], x)
        down_states = [h]
        for i in range(n_levels):
            blk = params["down_blocks"][str(i)]
            with_attn = cfg.down_block_types[i] == "CrossAttnDownBlock2D"
            heads = cfg.num_attention_heads[i]
            for j in range(cfg.layers_per_block):
                h = L.resnet_block(blk["resnets"][str(j)], h, emb, groups=g, eps=eps)
                if with_attn:
                    h = transformer2d(blk["attentions"][str(j)], h, ctx, heads, mode, i)
                down_states.append(h)
            if i < n_levels - 1:
                h = L.downsample2d(blk["downsamplers"]["0"], h)
                down_states.append(h)

        p = params["mid_block"]
        h = L.resnet_block(p["resnets"]["0"], h, emb, groups=g, eps=eps)
        h = transformer2d(p["attentions"]["0"], h, ctx,
                          cfg.num_attention_heads[-1], mode, n_levels - 1)
        h = L.resnet_block(p["resnets"]["1"], h, emb, groups=g, eps=eps)

        for i in range(n_levels):
            blk = params["up_blocks"][str(i)]
            with_attn = cfg.up_block_types[i] == "CrossAttnUpBlock2D"
            heads = cfg.num_attention_heads[n_levels - 1 - i]
            for j in range(cfg.layers_per_block + 1):
                skip = down_states.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = L.resnet_block(blk["resnets"][str(j)], h, emb, groups=g, eps=eps)
                if with_attn:
                    h = transformer2d(blk["attentions"][str(j)], h, ctx, heads,
                                      mode, n_levels - 1 - i)
            if i < n_levels - 1:
                h = L.upsample2d(blk["upsamplers"]["0"], h)
        return h

    # --- dispatch 1: reference pass fills the banks (output discarded:
    # the reference multiplies it by 0 / never reads it) ---
    if ref_context is None:
        ctx_ref = jnp.repeat(context, n, axis=0)
    else:
        ctx_ref = ref_context.reshape((b * n,) + ref_context.shape[2:])
    ref_conv = "conv_in" if ref_mask is not None else "conv_in_ref"
    dispatch(ref_flat, ctx_ref, ref_conv, mode="store")

    # --- dispatch 2: target pass consumes the banks ---
    h = dispatch(sample, context, "conv_in", mode="consume")
    assert not bank, "bank not fully consumed"

    h = L.group_norm(params["conv_norm_out"], h, groups=g, eps=eps)
    return L.conv2d(params["conv_out"], L.silu(h))


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(1))
    return cfg, params


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


ufwd = jax.jit(unet.forward, static_argnames=("cfg", "attn_impl", "remat"))


class TestTwoPassEquivalence:
    def test_two_shot(self, setup):
        cfg, params = setup
        b, n, s = 2, 2, 8
        sample = _rand(b, s, s, cfg.in_channels, seed=0)
        ref = _rand(b, n, s, s, cfg.ref_in_channels, seed=1)
        ctx = _rand(b, 2, cfg.cross_attention_dim, seed=2)
        joint = ufwd(params, cfg, sample, 1, ctx, ref_sample=ref)
        two = _two_pass_forward(params, cfg, sample, 1, ctx, ref)
        np.testing.assert_allclose(np.asarray(joint), np.asarray(two),
                                   atol=2e-5, rtol=2e-5)

    def test_padded_shot_masking(self, setup):
        cfg, params = setup
        b, n, s = 2, 3, 8
        sample = _rand(b, s, s, cfg.in_channels, seed=3)
        ref = _rand(b, n, s, s, cfg.ref_in_channels, seed=4)
        ctx = _rand(b, 2, cfg.cross_attention_dim, seed=5)
        mask = jnp.asarray([[True, True, False], [True, False, False]])
        joint = ufwd(params, cfg, sample, 1, ctx, ref_sample=ref, shot_mask=mask)
        two = _two_pass_forward(params, cfg, sample, 1, ctx, ref, shot_mask=mask)
        np.testing.assert_allclose(np.asarray(joint), np.asarray(two),
                                   atol=2e-5, rtol=2e-5)

    def test_per_shot_context(self, setup):
        cfg, params = setup
        b, n, s = 1, 2, 8
        sample = _rand(b, s, s, cfg.in_channels, seed=6)
        ref = _rand(b, n, s, s, cfg.ref_in_channels, seed=7)
        ctx = _rand(b, 2, cfg.cross_attention_dim, seed=8)
        rctx = _rand(b, n, 2, cfg.cross_attention_dim, seed=9)
        joint = ufwd(params, cfg, sample, 5, ctx, ref_sample=ref, ref_context=rctx)
        two = _two_pass_forward(params, cfg, sample, 5, ctx, ref, ref_context=rctx)
        np.testing.assert_allclose(np.asarray(joint), np.asarray(two),
                                   atol=2e-5, rtol=2e-5)

    def test_attn_mask_variant(self, setup):
        """4-channel support latents through the shared conv_in + per-level
        (1-mask)*-1e4 key biases (`unet_2d_condition_attn.py:645-666`)."""
        cfg, params = setup
        b, n, s = 2, 2, 8
        sample = _rand(b, s, s, cfg.in_channels, seed=10)
        ref = _rand(b, n, s, s, cfg.in_channels, seed=11)  # 4-ch, shared conv
        ctx = _rand(b, 2, cfg.cross_attention_dim, seed=12)
        rmask = (jnp.asarray(
            np.random.default_rng(13).uniform(size=(b, n, s, s))) > 0.5
        ).astype(jnp.float32)
        joint = ufwd(params, cfg, sample, 1, ctx, ref_sample=ref, ref_mask=rmask)
        two = _two_pass_forward(params, cfg, sample, 1, ctx, ref, ref_mask=rmask)
        np.testing.assert_allclose(np.asarray(joint), np.asarray(two),
                                   atol=2e-5, rtol=2e-5)

    def test_pallas_impl_matches_two_pass(self, setup):
        """The flash-kernel path must satisfy the same model-level contract
        (CPU: runs the Pallas interpreter lowering)."""
        cfg, params = setup
        b, n, s = 1, 2, 8
        sample = _rand(b, s, s, cfg.in_channels, seed=14)
        ref = _rand(b, n, s, s, cfg.ref_in_channels, seed=15)
        ctx = _rand(b, 2, cfg.cross_attention_dim, seed=16)
        try:
            joint = ufwd(params, cfg, sample, 1, ctx, ref_sample=ref,
                         attn_impl="pallas")
        except Exception as e:  # pragma: no cover - platform-dependent
            pytest.skip(f"pallas lowering unavailable on this backend: {e}")
        two = _two_pass_forward(params, cfg, sample, 1, ctx, ref)
        np.testing.assert_allclose(np.asarray(joint), np.asarray(two),
                                   atol=5e-4, rtol=5e-4)
