"""External parity oracles for the CLIP text path (VERDICT r1 next #4).

Two anchors available in THIS environment (no diffusers / real checkpoints):

1. `transformers.CLIPTextModel` (installed, torch CPU) — forward parity of
   our functional text tower against HF through a random-weight checkpoint
   saved in HF layout and read by our `load_text_encoder`.  This pins the
   full path the reference uses at `evaluation_util/main_oss.py:369` /
   `train_icl_*_v3.py:1086-1090` (text_encoder(input_ids)[0]).
2. `/root/reference/temp_input_ids.pt` — the frozen empty-prompt ids the
   reference trainer consumes at `train_icl_*_v3.py:1319`; must equal
   `empty_prompt_ids(pad_to=77)`.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu import checkpoint as ckpt_lib
from diffews_tpu.configs import CLIPTextConfig
from diffews_tpu.models import clip_text

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF_IDS_PT = "/root/reference/temp_input_ids.pt"


def test_empty_prompt_ids_match_reference_pt():
    if not os.path.exists(REF_IDS_PT):
        pytest.skip("reference temp_input_ids.pt not present")
    ref = torch.load(REF_IDS_PT, map_location="cpu", weights_only=True)
    ref = np.asarray(ref).reshape(1, -1)
    ours = np.asarray(clip_text.empty_prompt_ids(CLIPTextConfig.sd21(),
                                                 pad_to=ref.shape[1]))
    np.testing.assert_array_equal(ours, ref)


def _hf_config(act: str) -> "transformers.CLIPTextConfig":
    # small but non-trivial: >1 layer, heads>1, intermediate != hidden
    return transformers.CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=160,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, layer_norm_eps=1e-5, hidden_act=act,
        bos_token_id=49406, eos_token_id=49407,
    )


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_clip_text_forward_matches_transformers(tmp_path, act):
    """Random-weight HF checkpoint -> our loader -> our forward must match
    `CLIPTextModel(...)(input_ids).last_hidden_state` (fp32).  Covers the
    HF-layout key mapping (text_model. prefix strip, linear transposes,
    embedding tables), causal masking, pre-LN residual order, exact-erf
    vs sigmoid-approx GELU, and the final layer norm."""
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(_hf_config(act)).eval()
    model_dir = tmp_path / "text_encoder"
    hf.save_pretrained(model_dir, safe_serialization=True)

    params, cfg = ckpt_lib.load_text_encoder(str(model_dir))
    assert cfg.hidden_act == act

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, size=(2, 77)).astype(np.int32)
    ids[:, 0] = 49406 % 512  # arbitrary; content irrelevant to parity

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    ours = np.asarray(clip_text.forward(params, cfg, jnp.asarray(ids)))

    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_clip_text_forward_matches_transformers_short_seq(tmp_path):
    """The eval protocol embeds "" unpadded -> seq len 2
    (`marigold_pipeline_rgb_latent_noise.py:591-600`); parity must hold at
    that shape too (position-embedding slicing)."""
    torch.manual_seed(1)
    hf = transformers.CLIPTextModel(_hf_config("gelu")).eval()
    model_dir = tmp_path / "text_encoder"
    hf.save_pretrained(model_dir, safe_serialization=True)
    params, cfg = ckpt_lib.load_text_encoder(str(model_dir))

    ids = np.asarray([[49406 % 512, 49407 % 512]], np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    ours = np.asarray(clip_text.forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)
