"""Externally-anchored numerical parity tests.

The golden end-to-end metric tests (tests/test_golden.py) need real
checkpoints/datasets that don't exist in this environment, but two hard
oracles DO exist and are consumed here:

- `/root/reference/temp_input_ids.pt` — the frozen empty-prompt token ids
  the reference trains with (`train_tools/train_icl_*_v3.py:1319,1368`).
- `transformers.CLIPTextModel` (installed) — the exact torch module the
  reference loads for its frozen text tower
  (`evaluation_util/main_oss.py:369`).  A random-weight model saved in HF
  layout and loaded through our `checkpoint.load_text_encoder` pins the
  full forward path (embeddings, causal pre-LN attention, erf-GELU MLP,
  final LN) numerically against torch.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffews_tpu import checkpoint as ckpt
from diffews_tpu.configs import CLIPTextConfig
from diffews_tpu.models import clip_text

REF_IDS = "/root/reference/temp_input_ids.pt"


@pytest.mark.skipif(not os.path.exists(REF_IDS), reason="reference ids absent")
def test_empty_prompt_ids_match_reference_tensor():
    ref = torch.load(REF_IDS, weights_only=False, map_location="cpu").numpy()
    ours = np.asarray(clip_text.empty_prompt_ids(CLIPTextConfig.sd21(), pad_to=77))
    np.testing.assert_array_equal(ours, ref)


class TestCLIPTextForwardParity:
    @pytest.fixture(scope="class")
    def hf_model_dir(self, tmp_path_factory):
        transformers = pytest.importorskip("transformers")
        cfg = transformers.CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="gelu",
            bos_token_id=49406 % 1000, eos_token_id=49407 % 1000,
        )
        torch.manual_seed(0)
        model = transformers.CLIPTextModel(cfg).eval()
        d = tmp_path_factory.mktemp("clip") / "text_encoder"
        model.save_pretrained(d)
        return str(d), model

    def _ids(self, vocab, rows):
        rng = np.random.default_rng(0)
        return rng.integers(0, vocab, size=(rows, 77), dtype=np.int64)

    def test_last_hidden_state_matches_transformers(self, hf_model_dir):
        model_dir, model = hf_model_dir
        params, cfg = ckpt.load_text_encoder(model_dir)
        ids = self._ids(cfg.vocab_size, rows=3)

        with torch.no_grad():
            ref = model(torch.from_numpy(ids))[0].numpy()
        ours = np.asarray(clip_text.forward(params, cfg, ids.astype(np.int32)))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_empty_prompt_padded_embedding_matches(self, hf_model_dir):
        """The exact training-time call: 77-padded empty-prompt ids."""
        model_dir, model = hf_model_dir
        params, cfg = ckpt.load_text_encoder(model_dir)
        ids = np.asarray(clip_text.empty_prompt_ids(cfg, pad_to=77))
        with torch.no_grad():
            ref = model(torch.from_numpy(ids.astype(np.int64)))[0].numpy()
        ours = np.asarray(clip_text.forward(params, cfg, ids))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_unpadded_eval_ids_match(self, hf_model_dir):
        """Eval embeds [bos, eos] with no padding
        (`marigold_pipeline_rgb_latent_noise.py:591-600`)."""
        model_dir, model = hf_model_dir
        params, cfg = ckpt.load_text_encoder(model_dir)
        ids = np.asarray(clip_text.empty_prompt_ids(cfg))
        assert ids.shape == (1, 2)
        with torch.no_grad():
            ref = model(torch.from_numpy(ids.astype(np.int64)))[0].numpy()
        ours = np.asarray(clip_text.forward(params, cfg, ids))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)
