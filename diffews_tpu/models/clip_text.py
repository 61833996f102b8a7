"""CLIP text encoder (OpenCLIP ViT-H text tower, as in SD-2.1 checkpoints).

Counterpart of the frozen `CLIPTextModel` the reference loads from the
checkpoint's `text_encoder/` subfolder (`evaluation_util/main_oss.py:369`;
`train_tools/train_icl_*_v3.py:1086-1090`) to embed the empty prompt:
eval tokenizes "" with `padding="do_not_pad"` -> [bos, eos] (seq len 2,
`marigold_pipeline_rgb_latent_noise.py:591-600`), training uses the 77-token
padded ids from `temp_input_ids.pt` (`train_icl_*_v3.py:1319,1368`).

Pre-LN transformer with causal masking; `hidden_act="gelu"` is the exact
(erf) GELU.  Returns the final-layer-norm'd last hidden state, i.e.
`text_encoder(input_ids)[0]`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffews_tpu.configs import CLIPTextConfig
from diffews_tpu.models import layers as L
from diffews_tpu.utils import init as I


def _attention(p, x, heads, causal_bias):
    b, s, c = x.shape
    hd = c // heads
    q = L.linear(p["q_proj"], x).reshape(b, s, heads, hd)
    k = L.linear(p["k_proj"], x).reshape(b, s, heads, hd)
    v = L.linear(p["v_proj"], x).reshape(b, s, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (hd**-0.5) + causal_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
    return L.linear(p["out_proj"], out)


def forward(params, cfg: CLIPTextConfig, input_ids: jax.Array) -> jax.Array:
    """input_ids: (B, S) int32 -> last hidden state (B, S, hidden) after final LN."""
    b, s = input_ids.shape
    emb = params["embeddings"]
    # jnp.asarray: params may live host-side as numpy (the train CLI
    # offloads the frozen text tower after its one-time use); jnp indexing
    # also keeps gather semantics identical either way
    x = jnp.asarray(emb["token_embedding"]["embedding"])[jnp.asarray(input_ids)]
    x = x + jnp.asarray(emb["position_embedding"]["embedding"])[:s][None]

    causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
    eps = cfg.layer_norm_eps
    for i in range(cfg.num_hidden_layers):
        p = params["encoder"]["layers"][str(i)]
        x = x + _attention(
            p["self_attn"], L.layer_norm(p["layer_norm1"], x, eps=eps),
            cfg.num_attention_heads, causal,
        )
        h = L.layer_norm(p["layer_norm2"], x, eps=eps)
        h = L.linear(p["mlp"]["fc1"], h)
        h = L.gelu(h) if cfg.hidden_act == "gelu" else jax.nn.sigmoid(1.702 * h) * h
        x = x + L.linear(p["mlp"]["fc2"], h)

    return L.layer_norm(params["final_layer_norm"], x, eps=eps)


def empty_prompt_ids(cfg: CLIPTextConfig, pad_to: int | None = None) -> jnp.ndarray:
    """Token ids of the empty prompt.

    `pad_to=None` -> [bos, eos] (eval protocol); `pad_to=77` -> padded with
    pad-token 0 like the reference's `temp_input_ids.pt` ([49406, 49407, 0...],
    SURVEY.md §2.1 "Frozen empty-prompt ids").
    """
    ids = [cfg.bos_token_id, cfg.eos_token_id]
    if pad_to is not None:
        ids = ids + [0] * (pad_to - len(ids))
    return jnp.asarray([ids], dtype=jnp.int32)


def init_params(rng, cfg: CLIPTextConfig) -> dict:
    r = I.RngStream(rng)
    c = cfg.hidden_size
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "layer_norm1": I.norm_params(c),
            "self_attn": {
                "q_proj": I.linear_params(r(), c, c),
                "k_proj": I.linear_params(r(), c, c),
                "v_proj": I.linear_params(r(), c, c),
                "out_proj": I.linear_params(r(), c, c),
            },
            "layer_norm2": I.norm_params(c),
            "mlp": {
                "fc1": I.linear_params(r(), c, cfg.intermediate_size),
                "fc2": I.linear_params(r(), cfg.intermediate_size, c),
            },
        }
    return {
        "embeddings": {
            "token_embedding": I.embedding_params(r(), cfg.vocab_size, c),
            "position_embedding": I.embedding_params(r(), cfg.max_position_embeddings, c),
        },
        "encoder": {"layers": layers},
        "final_layer_norm": I.norm_params(c),
    }
