"""Diffusers-layout checkpoint I/O for JAX pytrees.

The reference's checkpoint format contract (SURVEY.md §3.4): a diffusers
directory tree

    checkpoint/
      unet/{config.json, diffusion_pytorch_model.safetensors|.bin}
      vae/{config.json, ...}
      text_encoder/{config.json, model.safetensors|pytorch_model.bin}
      tokenizer/{vocab.json, merges.txt, ...}
      scheduler/scheduler_config.json

where `unet/` holds standard SD-2.1 weights plus `conv_in_ref.{weight,bias}`
(created by the surgery tool, reference
`train_tools/load_ckpt_and_modify_ref8in_tag4in.py:7-29`).  Training
checkpoints are `checkpoint-{step}/unet[_ema]/` in the same format
(`train_tools/train_icl_*_v3.py:1128-1160`).

Because the JAX param trees mirror diffusers module paths, conversion is a
mechanical rule set, not a per-module table:
  - keys split on "."; torch "weight" becomes "kernel" (conv OIHW->HWIO,
    linear (out,in)->(in,out)), 1-D "weight" becomes "scale",
    embedding "weight" stays untransposed under "embedding"
  - legacy VAE attention aliases (query/key/value/proj_attn) map to
    to_q/to_k/to_v/to_out.0
  - the CLIP text encoder's "text_model." prefix is stripped
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from diffews_tpu.configs import (
    CLIPTextConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
    load_json_config,
)

WEIGHTS_SAFETENSORS = "diffusion_pytorch_model.safetensors"
WEIGHTS_BIN = "diffusion_pytorch_model.bin"
TEXT_SAFETENSORS = "model.safetensors"
TEXT_BIN = "pytorch_model.bin"

_EMBEDDING_MARKERS = ("token_embedding", "position_embedding")
_LEGACY_VAE_ALIASES = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out.0",
}


# ---------------------------------------------------------------------------
# torch-tensor dict <-> JAX pytree
# ---------------------------------------------------------------------------


def _is_embedding(path: str) -> bool:
    return any(m in path for m in _EMBEDDING_MARKERS)


def torch_state_to_pytree(state: Dict[str, np.ndarray], dtype=jnp.float32) -> dict:
    """Flat torch state-dict -> nested JAX param tree (JAX layouts)."""
    tree: dict = {}
    for key, val in state.items():
        if key.startswith("text_model."):
            key = key[len("text_model.") :]
        parts = key.split(".")
        # legacy VAE attention naming
        if len(parts) >= 2 and parts[-2] in _LEGACY_VAE_ALIASES:
            parts = parts[:-2] + _LEGACY_VAE_ALIASES[parts[-2]].split(".") + parts[-1:]
        leaf = parts[-1]
        mod_path = ".".join(parts[:-1])
        arr = np.asarray(val)

        if leaf == "weight":
            if _is_embedding(mod_path):
                name, out = "embedding", arr
            elif arr.ndim == 4:  # conv OIHW -> HWIO
                name, out = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:  # linear (out,in) -> (in,out)
                name, out = "kernel", arr.T
            else:  # norm scale
                name, out = "scale", arr
        elif leaf == "bias":
            name, out = "bias", arr
        else:
            # non-parameter buffers (e.g. position_ids) are dropped
            continue

        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[name] = jnp.asarray(np.ascontiguousarray(out), dtype=dtype)
    return tree


def pytree_to_torch_state(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested JAX param tree -> flat torch state-dict (torch layouts)."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        mod = ".".join(path)
        if "kernel" in node:
            arr = np.asarray(node["kernel"])
            out[f"{mod}.weight"] = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        if "scale" in node:
            out[f"{mod}.weight"] = np.asarray(node["scale"])
        if "embedding" in node:
            out[f"{mod}.weight"] = np.asarray(node["embedding"])
        if "bias" in node:
            out[f"{mod}.bias"] = np.asarray(node["bias"])
        for k, v in node.items():
            if isinstance(v, dict):
                rec(v, path + [k])

    rec(tree, [prefix] if prefix else [])
    return out


# ---------------------------------------------------------------------------
# file IO
# ---------------------------------------------------------------------------


def _load_torch_weights(model_dir: str, names: Tuple[str, ...]) -> Dict[str, np.ndarray]:
    for name in names:
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            if name.endswith(".safetensors"):
                from safetensors import numpy as st_np

                return st_np.load_file(path)
            else:
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True)
                return {k: v.float().numpy() for k, v in sd.items()}
        # sharded safetensors
        index = os.path.join(model_dir, name + ".index.json")
        if os.path.exists(index):
            from safetensors import numpy as st_np

            with open(index) as f:
                shard_names = sorted(set(json.load(f)["weight_map"].values()))
            state: Dict[str, np.ndarray] = {}
            for shard in shard_names:
                state.update(st_np.load_file(os.path.join(model_dir, shard)))
            return state
    raise FileNotFoundError(f"no weights file in {model_dir} (tried {names})")


def save_torch_weights(state: Dict[str, np.ndarray], model_dir: str, name: str = WEIGHTS_SAFETENSORS):
    os.makedirs(model_dir, exist_ok=True)
    from safetensors import numpy as st_np

    st_np.save_file(
        {k: np.ascontiguousarray(v) for k, v in state.items()},
        os.path.join(model_dir, name),
    )


# ---------------------------------------------------------------------------
# model loaders / savers
# ---------------------------------------------------------------------------


def load_unet(model_dir: str, dtype=jnp.float32) -> Tuple[dict, UNetConfig]:
    cfg_d = load_json_config(os.path.join(model_dir, "config.json"))
    state = _load_torch_weights(model_dir, (WEIGHTS_SAFETENSORS, WEIGHTS_BIN))
    cfg = UNetConfig.from_diffusers_dict(cfg_d)
    if "conv_in_ref.weight" in state:
        cfg_d2 = dict(cfg_d)
        cfg_d2["ref_in_channels"] = state["conv_in_ref.weight"].shape[1]
        cfg = UNetConfig.from_diffusers_dict(cfg_d2)
    return torch_state_to_pytree(state, dtype), cfg


def load_vae(model_dir: str, dtype=jnp.float32) -> Tuple[dict, VAEConfig]:
    cfg = VAEConfig.from_diffusers_dict(load_json_config(os.path.join(model_dir, "config.json")))
    state = _load_torch_weights(model_dir, (WEIGHTS_SAFETENSORS, WEIGHTS_BIN))
    return torch_state_to_pytree(state, dtype), cfg


def load_text_encoder(model_dir: str, dtype=jnp.float32) -> Tuple[dict, CLIPTextConfig]:
    cfg = CLIPTextConfig.from_diffusers_dict(load_json_config(os.path.join(model_dir, "config.json")))
    state = _load_torch_weights(model_dir, (TEXT_SAFETENSORS, TEXT_BIN))
    return torch_state_to_pytree(state, dtype), cfg


def save_unet(params: dict, cfg: UNetConfig, model_dir: str):
    """Write a diffusers-layout UNet dir consumable by the reference."""
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        d = cfg.to_diffusers_dict()
        json.dump(d, f, indent=2)
    save_torch_weights(pytree_to_torch_state(params), model_dir)


def save_vae(params: dict, cfg: VAEConfig, model_dir: str):
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg.to_diffusers_dict(), f, indent=2)
    save_torch_weights(pytree_to_torch_state(params), model_dir)


# ---------------------------------------------------------------------------
# checkpoint surgery (ref 8-channel input conv)
# ---------------------------------------------------------------------------


def make_ref_conv_surgery(params: dict, duplicate: int = 2) -> dict:
    """Fabricate `conv_in_ref` from `conv_in` on a vanilla SD checkpoint.

    Repeats the input-channel axis `duplicate` times and divides by
    `duplicate` so the initial response to (rgb ‖ mask) matches the original
    response to rgb — the reference's surgery
    (`train_tools/load_ckpt_and_modify_ref8in_tag4in.py:21-25`).
    """
    k = params["conv_in"]["kernel"]  # HWIO
    ref_kernel = jnp.tile(k, (1, 1, duplicate, 1)) / duplicate
    out = dict(params)
    out["conv_in_ref"] = {
        "kernel": ref_kernel,
        "bias": params["conv_in"]["bias"],
    }
    return out


def surgery_checkpoint(src_ckpt: str, dst_ckpt: str):
    """Clone a diffusers SD checkpoint, adding the 8-ch `conv_in_ref`.

    Equivalent of `load_ckpt_and_modify_ref8in_tag4in.py` producing the
    `...-ref8inchannels-tag4inchannels` base checkpoint.
    """
    import shutil

    params, cfg = load_unet(os.path.join(src_ckpt, "unet"))
    params = make_ref_conv_surgery(params)
    os.makedirs(dst_ckpt, exist_ok=True)
    for sub in os.listdir(src_ckpt):
        s = os.path.join(src_ckpt, sub)
        d = os.path.join(dst_ckpt, sub)
        if sub == "unet" or not os.path.isdir(s):
            continue
        if not os.path.exists(d):
            shutil.copytree(s, d)
    import dataclasses

    cfg = dataclasses.replace(cfg, ref_in_channels=cfg.in_channels * 2)
    save_unet(params, cfg, os.path.join(dst_ckpt, "unet"))
    # copy top-level model_index.json if present
    mi = os.path.join(src_ckpt, "model_index.json")
    if os.path.exists(mi):
        shutil.copy(mi, os.path.join(dst_ckpt, "model_index.json"))


# ---------------------------------------------------------------------------
# full pipeline bundle
# ---------------------------------------------------------------------------


class PipelineBundle:
    """All params/configs needed by the inference pipeline."""

    def __init__(self, unet_params, unet_cfg, vae_params, vae_cfg,
                 text_params, text_cfg, scheduler_cfg):
        self.unet_params = unet_params
        self.unet_cfg = unet_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.text_params = text_params
        self.text_cfg = text_cfg
        self.scheduler_cfg = scheduler_cfg


def load_pipeline_bundle(
    checkpoint: str,
    unet_dir: Optional[str] = None,
    scheduler_dir: Optional[str] = None,
    dtype=jnp.float32,
) -> PipelineBundle:
    """Mirror of the reference eval loading flow (`main_oss.py:338-372`):
    base checkpoint supplies VAE/text-encoder/tokenizer; `unet_dir`
    (`--unet_ckpt_path <ckpt>/unet`) overrides the UNet; `scheduler_dir`
    (`--scheduler_load_path`) overrides the scheduler config."""
    unet_params, unet_cfg = load_unet(unet_dir or os.path.join(checkpoint, "unet"), dtype)
    vae_params, vae_cfg = load_vae(os.path.join(checkpoint, "vae"), dtype)
    text_params, text_cfg = load_text_encoder(os.path.join(checkpoint, "text_encoder"), dtype)
    sched_dir = scheduler_dir or os.path.join(checkpoint, "scheduler")
    scheduler_cfg = SchedulerConfig.from_diffusers_dict(
        load_json_config(os.path.join(sched_dir, "scheduler_config.json"))
    )
    return PipelineBundle(unet_params, unet_cfg, vae_params, vae_cfg,
                          text_params, text_cfg, scheduler_cfg)
