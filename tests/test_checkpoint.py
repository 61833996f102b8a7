"""Checkpoint format contract tests.

The rebuild must read/write the exact diffusers layout (key names incl.
`conv_in_ref.*`) so reference checkpoints drop in (SURVEY.md §5
"Checkpoint / resume").
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    params = jax.jit(lambda r: unet.init_params(r, cfg))(jax.random.PRNGKey(0))
    return cfg, params


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), f"{path}: {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}.{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}.{k}")


class TestStateRoundtrip:
    def test_unet_roundtrip_bit_exact(self, tiny_unet):
        cfg, params = tiny_unet
        state = C.pytree_to_torch_state(params)
        back = C.torch_state_to_pytree(state)
        _tree_equal(params, back)

    def test_diffusers_key_names(self, tiny_unet):
        cfg, params = tiny_unet
        state = C.pytree_to_torch_state(params)
        expected = [
            "conv_in.weight",
            "conv_in_ref.weight",
            "conv_in_ref.bias",
            "time_embedding.linear_1.weight",
            "down_blocks.0.resnets.0.conv1.weight",
            "down_blocks.0.resnets.0.time_emb_proj.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
            "down_blocks.0.downsamplers.0.conv.weight",
            "mid_block.attentions.0.proj_in.weight",
            "up_blocks.1.attentions.1.norm.weight",
            "conv_norm_out.weight",
            "conv_out.bias",
        ]
        for k in expected:
            assert k in state, f"missing diffusers key {k}"
        # torch layouts
        assert state["conv_in.weight"].shape == (32, 4, 3, 3)  # OIHW
        assert state["conv_in_ref.weight"].shape == (32, 8, 3, 3)

    def test_vae_key_names(self):
        cfg = VAEConfig.tiny()
        params = jax.jit(lambda r: vae.init_params(r, cfg))(jax.random.PRNGKey(1))
        state = C.pytree_to_torch_state(params)
        for k in [
            "encoder.conv_in.weight",
            "encoder.down_blocks.0.resnets.0.norm1.weight",
            "encoder.down_blocks.0.downsamplers.0.conv.weight",
            "encoder.mid_block.attentions.0.to_q.weight",
            "encoder.mid_block.attentions.0.group_norm.weight",
            "decoder.up_blocks.0.resnets.1.conv2.weight",
            "decoder.up_blocks.0.upsamplers.0.conv.weight",
            "quant_conv.weight",
            "post_quant_conv.bias",
        ]:
            assert k in state, f"missing VAE key {k}"

    def test_legacy_vae_attention_aliases(self):
        state = {
            "encoder.mid_block.attentions.0.query.weight": np.zeros((8, 8), np.float32),
            "encoder.mid_block.attentions.0.proj_attn.bias": np.zeros((8,), np.float32),
        }
        tree = C.torch_state_to_pytree(state)
        a = tree["encoder"]["mid_block"]["attentions"]["0"]
        assert "kernel" in a["to_q"]
        assert "bias" in a["to_out"]["0"]

    def test_text_model_prefix_stripped(self):
        state = {
            "text_model.embeddings.token_embedding.weight": np.zeros((10, 4), np.float32),
            "text_model.encoder.layers.0.self_attn.q_proj.weight": np.zeros((4, 4), np.float32),
        }
        tree = C.torch_state_to_pytree(state)
        assert tree["embeddings"]["token_embedding"]["embedding"].shape == (10, 4)
        assert tree["encoder"]["layers"]["0"]["self_attn"]["q_proj"]["kernel"].shape == (4, 4)


class TestFileIO:
    def test_save_load_unet_dir(self, tiny_unet, tmp_path):
        cfg, params = tiny_unet
        d = str(tmp_path / "unet")
        C.save_unet(params, cfg, d)
        assert os.path.exists(os.path.join(d, "config.json"))
        assert os.path.exists(os.path.join(d, C.WEIGHTS_SAFETENSORS))
        params2, cfg2 = C.load_unet(d)
        assert cfg2.block_out_channels == cfg.block_out_channels
        assert cfg2.ref_in_channels == 8
        _tree_equal(params, params2)

    def test_load_torch_bin_format(self, tiny_unet, tmp_path):
        import torch

        cfg, params = tiny_unet
        state = C.pytree_to_torch_state(params)
        d = tmp_path / "unet_bin"
        d.mkdir()
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
                   d / C.WEIGHTS_BIN)
        with open(d / "config.json", "w") as f:
            import json

            json.dump(cfg.to_diffusers_dict(), f)
        params2, _ = C.load_unet(str(d))
        _tree_equal(params, params2)


class TestSurgery:
    def test_ref_conv_from_conv_in(self, tiny_unet):
        """conv_in_ref = conv_in repeated over input channels / 2, bias copied
        (load_ckpt_and_modify_ref8in_tag4in.py:21-25): the 8-ch response to
        (x ‖ x) equals the original 4-ch response to x."""
        cfg, params = tiny_unet
        out = C.make_ref_conv_surgery(params)
        k, kr = params["conv_in"]["kernel"], out["conv_in_ref"]["kernel"]
        assert kr.shape[2] == 2 * k.shape[2]
        np.testing.assert_allclose(np.asarray(kr[:, :, : k.shape[2]]), np.asarray(k) / 2)
        np.testing.assert_array_equal(
            np.asarray(out["conv_in_ref"]["bias"]), np.asarray(params["conv_in"]["bias"])
        )
        from diffews_tpu.models import layers as L

        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)).astype(np.float32))
        y4 = L.conv2d(params["conv_in"], x)
        y8 = L.conv2d(out["conv_in_ref"], jnp.concatenate([x, x], axis=-1))
        np.testing.assert_allclose(np.asarray(y8), np.asarray(y4), rtol=1e-5, atol=1e-5)

    def test_surgery_checkpoint_dir(self, tiny_unet, tmp_path):
        cfg, params = tiny_unet
        # build a vanilla checkpoint (no conv_in_ref)
        vanilla = {k: v for k, v in params.items() if k != "conv_in_ref"}
        src = tmp_path / "sd"
        C.save_unet(vanilla, cfg, str(src / "unet"))
        (src / "scheduler").mkdir()
        with open(src / "scheduler" / "scheduler_config.json", "w") as f:
            import json

            json.dump(SchedulerConfig.diffews().to_diffusers_dict(), f)
        dst = tmp_path / "sd-ref8"
        C.surgery_checkpoint(str(src), str(dst))
        params2, cfg2 = C.load_unet(str(dst / "unet"))
        assert "conv_in_ref" in params2
        assert cfg2.ref_in_channels == 8
        assert (dst / "scheduler" / "scheduler_config.json").exists()
