"""LoRA adapters (training/lora.py) on tiny configs.

No reference counterpart (the reference only full-fine-tunes,
`train_icl_*_v3.py:1186`); these pin the adapter math and its train/
checkpoint integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.training import lora as lora_lib
from diffews_tpu.training.state import TrainerConfig, init_state


@pytest.fixture(scope="module")
def setup():
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    text = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.float32)
    return ucfg, vcfg, up, vp, text


def _batch(gas=1, b=2, n=2, s=32, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *sh: rng.uniform(-1, 1, sh).astype(np.float32)
    return {
        "query": f(gas, b, s, s, 3),
        "q_mask3": f(gas, b, s, s, 3),
        "supports": f(gas, b, n, s, s, 3),
        "s_mask3": f(gas, b, n, s, s, 3),
        "shot_mask": np.ones((gas, b, n), bool),
    }


def _fwd(params, ucfg, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 2, ucfg.cross_attention_dim)),
                      jnp.float32)
    ref = jnp.asarray(rng.normal(size=(2, 1, 8, 8, 8)), jnp.float32)
    return jax.jit(unet.forward, static_argnames=("cfg",))(
        params, ucfg, x, 1, ctx, ref_sample=ref)


class TestLoraMath:
    def test_init_targets_attention_only(self, setup):
        ucfg, _, up, _, _ = setup
        lora = lora_lib.init_lora(jax.random.PRNGKey(0), up, rank=2)
        flat = jax.tree_util.tree_leaves_with_path(lora)
        paths = {jax.tree_util.keystr(p) for p, _ in flat}
        assert all("attn" in p for p in paths)
        assert any("to_q" in p for p in paths)
        # every adapted site has the right factor shapes
        def rec(node, p):
            if isinstance(node, dict) and "lora_a" in node:
                assert node["lora_a"].shape[1] == 2
                assert node["lora_b"].shape[0] == 2
                assert np.all(np.asarray(node["lora_b"]) == 0)
            elif isinstance(node, dict):
                for k, v in node.items():
                    rec(v, f"{p}.{k}")
        rec(lora, "")

    def test_wider_target_set_adds_ff(self, setup):
        _, _, up, _, _ = setup
        attn = lora_lib.init_lora(jax.random.PRNGKey(0), up, 2,
                                  lora_lib.attn_target)
        wide = lora_lib.init_lora(jax.random.PRNGKey(0), up, 2,
                                  lora_lib.attn_ff_target)
        n = lambda t: len(jax.tree_util.tree_leaves(t))
        assert n(wide) > n(attn)

    def test_zero_init_merge_is_identity(self, setup):
        ucfg, _, up, _, _ = setup
        lora = lora_lib.init_lora(jax.random.PRNGKey(0), up, rank=4)
        merged = lora_lib.merge_lora(up, lora, scale=1.0)
        np.testing.assert_array_equal(np.asarray(_fwd(merged, ucfg)),
                                      np.asarray(_fwd(up, ucfg)))

    def test_merge_applies_delta(self, setup):
        ucfg, _, up, _, _ = setup
        lora = lora_lib.init_lora(jax.random.PRNGKey(0), up, rank=4)
        # give B mass so the delta is nonzero
        lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)
        merged = lora_lib.merge_lora(up, lora, scale=0.5)
        out_m, out_b = _fwd(merged, ucfg), _fwd(up, ucfg)
        assert not np.allclose(np.asarray(out_m), np.asarray(out_b))
        # non-adapted leaves are untouched (e.g. conv kernels)
        np.testing.assert_array_equal(
            np.asarray(merged["conv_in"]["kernel"]),
            np.asarray(up["conv_in"]["kernel"]))


class TestLoraTraining:
    def test_step_trains_only_adapters(self, setup):
        ucfg, vcfg, up, vp, text = setup
        cfg = TrainerConfig(gradient_accumulation_steps=1,
                            compute_dtype=jnp.float32, remat=False,
                            lora_rank=4, use_ema=True)
        lora0 = lora_lib.init_lora(jax.random.PRNGKey(0), up, 4)
        state = init_state(cfg, lora0)
        step = jax.jit(lora_lib.make_lora_train_step(cfg, ucfg, vcfg))
        base_c = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), up)

        s1, m1 = step(state, _batch(), jax.random.PRNGKey(0), base_c, vp, text)
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["grad_norm"]) > 0
        # B factors moved off zero; the base tree is untouched by design
        def some_b(t):
            out = []
            def rec(n):
                if isinstance(n, dict) and "lora_b" in n:
                    out.append(np.asarray(n["lora_b"]))
                elif isinstance(n, dict):
                    for v in n.values():
                        rec(v)
            rec(t)
            return out
        assert any(np.abs(b).max() > 0 for b in some_b(s1.params))
        # optimizer state is rank-sized (orders of magnitude below the UNet)
        n_opt = sum(x.size for x in jax.tree_util.tree_leaves(s1.opt_state))
        n_unet = sum(x.size for x in jax.tree_util.tree_leaves(up))
        assert n_opt < n_unet / 10
        # a second step keeps improving machinery intact (EMA too)
        s2, m2 = step(s1, _batch(seed=1), jax.random.PRNGKey(1), base_c, vp,
                      text)
        assert np.isfinite(float(m2["loss"]))
        assert int(s2.ema.step) == 2

    def test_gas_scan_path(self, setup):
        ucfg, vcfg, up, vp, text = setup
        cfg = TrainerConfig(gradient_accumulation_steps=2,
                            compute_dtype=jnp.float32, remat=False,
                            lora_rank=2)
        lora0 = lora_lib.init_lora(jax.random.PRNGKey(0), up, 2)
        state = init_state(cfg, lora0)
        step = jax.jit(lora_lib.make_lora_train_step(cfg, ucfg, vcfg))
        base_c = up
        s1, m1 = step(state, _batch(gas=2), jax.random.PRNGKey(0), base_c,
                      vp, text)
        assert np.isfinite(float(m1["loss"]))


class TestLoraCheckpoint:
    def test_save_writes_merged_and_resume_restores_adapters(
            self, setup, tmp_path):
        from diffews_tpu import checkpoint as ckpt_lib
        from diffews_tpu.training import checkpoints as tck

        ucfg, vcfg, up, vp, text = setup
        cfg = TrainerConfig(gradient_accumulation_steps=1,
                            compute_dtype=jnp.float32, remat=False,
                            lora_rank=2)
        lora0 = lora_lib.init_lora(jax.random.PRNGKey(0), up, 2)
        # trained-ish adapters: bump B so the merge is non-trivial
        lora1 = jax.tree_util.tree_map(lambda x: x + 0.01, lora0)
        state = init_state(cfg, lora0)._replace(
            params=lora1, step=jnp.asarray(5, jnp.int32))
        merged = lora_lib.merge_lora(up, lora1, lora_lib.lora_scale(cfg))
        tck.save_checkpoint(str(tmp_path), 5, state, ucfg,
                            params_override=merged,
                            extra_aux={"lora": state.params})
        # unet/ holds the MERGED model in diffusers layout
        loaded, _ = ckpt_lib.load_unet(str(tmp_path / "checkpoint-5" / "unet"))
        np.testing.assert_allclose(
            np.asarray(loaded["conv_in"]["kernel"]),
            np.asarray(merged["conv_in"]["kernel"]), rtol=1e-6)
        # resume restores the raw adapter tree exactly
        template = init_state(cfg, lora0)
        restored, step = tck.load_checkpoint(
            str(tmp_path / "checkpoint-5"), template, lora=True)
        assert step == 5
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(lora1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
