"""Model-level pin: the joint single-pass UNet equals a LITERAL two-pass
KV-bank emulation of the reference semantics (VERDICT r1 next #5).

The reference dispatches the UNet twice per step: a "reference" pass over the
8-channel support latents whose every `attn1` STORES K/V into per-layer
`k_bank`/`v_bank` (`diffews/models/attention_processor.py:251-252,260-261`;
`unet_2d_condition.py:656-664`), then a "target" pass over the query latent
whose `attn1`s CONCATENATE the banked K/V after their own, shots folded into
the sequence (`attention_processor.py:254-267`;
`marigold_pipeline_rgb_latent_noise.py:706-725`).

Here we emulate exactly that with two dispatches of OUR UNet in single-stream
mode, intercepting `fused_kv_attention` to record (pass 1) / inject (pass 2)
banks in call order, and assert the joint forward (`unet.forward(...,
ref_sample=...)`) matches to float tolerance — covering ctx repetition,
time-emb broadcast, per-level stream splits, up-path banks, n-shot>1 with
padding, and the attn-mask variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import unet as unet_mod
from diffews_tpu.ops.attention import fused_kv_attention as _real_fused
from diffews_tpu.ops.resize import nearest_resize


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, shape).astype(np.float32))


def two_pass_reference(params, cfg, query, ref_sample, ctx, t, *,
                       shot_mask=None, ref_mask=None):
    """Literal two-dispatch bank emulation of the reference call sequence."""
    b, n = ref_sample.shape[0], ref_sample.shape[1]
    ref_flat = ref_sample.reshape((b * n,) + ref_sample.shape[2:])
    bank = []

    # --- pass 1: reference dispatch (is_target=False). Support rows enter
    # through conv_in_ref (attn-mask variant shares conv_in,
    # unet_2d_condition_attn.py:300-305); every attn1 stores K/V.
    p1 = params if ref_mask is not None else {**params, "conv_in": params["conv_in_ref"]}

    def record(q, k_own, v_own, k_sup, v_sup, **kw):
        assert k_sup is None and v_sup is None
        bank.append((k_own, v_own))
        return _real_fused(q, k_own, v_own, None, None, **kw)

    ctx_ref = jnp.repeat(ctx, n, axis=0)
    unet_mod.fused_kv_attention = record
    try:
        unet_mod.forward(p1, cfg, ref_flat, t, ctx_ref)  # output dropped, like the ref
    finally:
        unet_mod.fused_kv_attention = _real_fused

    # --- pass 2: target dispatch. Each attn1 concatenates its layer's bank
    # (shots folded into the KV sequence) after its own K/V.
    calls = [0]

    def inject(q, k_own, v_own, k_sup, v_sup, **kw):
        assert k_sup is None and v_sup is None
        kb, vb = bank[calls[0]]
        calls[0] += 1
        s_ref, h, d = kb.shape[1], kb.shape[2], kb.shape[3]
        sup_bias = None
        if ref_mask is not None:
            # the attn-mask variant biases support keys by the mask
            # nearest-resized to this level's token grid
            g = int(round(s_ref ** 0.5))
            m = nearest_resize(
                ref_mask.reshape((b * n,) + ref_mask.shape[2:]).astype(jnp.float32),
                (g, g))
            sup_bias = (1.0 - m.reshape(b, n * g * g)) * -10000.0
        return _real_fused(
            q, k_own, v_own,
            kb.reshape(b, n, s_ref, h, d), vb.reshape(b, n, s_ref, h, d),
            shot_mask=shot_mask, support_bias=sup_bias, **kw)

    unet_mod.fused_kv_attention = inject
    try:
        out = unet_mod.forward(params, cfg, query, t, ctx)
    finally:
        unet_mod.fused_kv_attention = _real_fused
    assert calls[0] == len(bank) and bank, "bank call order mismatch"
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet_mod.init_params(r, cfg))(jax.random.PRNGKey(0))
    return cfg, params


def test_joint_equals_two_pass_1shot(setup):
    cfg, params = setup
    b, n, s = 1, 1, 8
    query = _rand(b, s, s, cfg.in_channels, seed=1)
    ref = _rand(b, n, s, s, cfg.ref_in_channels, seed=2)
    ctx = _rand(b, 2, cfg.cross_attention_dim, seed=3)
    joint = unet_mod.forward(params, cfg, query, 1, ctx, ref_sample=ref)
    twopass = two_pass_reference(params, cfg, query, ref, ctx, 1)
    np.testing.assert_allclose(np.asarray(joint), np.asarray(twopass),
                               atol=1e-5, rtol=1e-5)


def test_joint_equals_two_pass_nshot_padded(setup):
    """n-shot with one padded shot: the joint pass's shot_mask fusion must
    equal a bank emulation where the padded shot's tokens are masked out."""
    cfg, params = setup
    b, n, s = 2, 3, 8
    query = _rand(b, s, s, cfg.in_channels, seed=4)
    ref = _rand(b, n, s, s, cfg.ref_in_channels, seed=5)
    ctx = _rand(b, 2, cfg.cross_attention_dim, seed=6)
    shot_mask = jnp.asarray([[True, True, False], [True, False, False]])
    joint = unet_mod.forward(params, cfg, query, 1, ctx, ref_sample=ref,
                             shot_mask=shot_mask)
    twopass = two_pass_reference(params, cfg, query, ref, ctx, 1,
                                 shot_mask=shot_mask)
    np.testing.assert_allclose(np.asarray(joint), np.asarray(twopass),
                               atol=1e-5, rtol=1e-5)


def test_joint_equals_two_pass_attn_mask_variant(setup):
    """Attn-mask conditioning variant: support RGB through the shared
    conv_in, support keys biased by (1-mask)*-1e4 at each level's grid."""
    cfg, params = setup
    b, n, s = 1, 2, 8
    query = _rand(b, s, s, cfg.in_channels, seed=7)
    ref = _rand(b, n, s, s, cfg.in_channels, seed=8)  # 4-ch RGB latents only
    ctx = _rand(b, 2, cfg.cross_attention_dim, seed=9)
    mask = (np.random.default_rng(10).uniform(0, 1, (b, n, 32, 32)) > 0.5)
    mask = jnp.asarray(mask.astype(np.float32))
    joint = unet_mod.forward(params, cfg, query, 1, ctx, ref_sample=ref,
                             ref_mask=mask)
    twopass = two_pass_reference(params, cfg, query, ref, ctx, 1,
                                 ref_mask=mask)
    np.testing.assert_allclose(np.asarray(joint), np.asarray(twopass),
                               atol=1e-5, rtol=1e-5)
