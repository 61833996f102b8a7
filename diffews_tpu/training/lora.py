"""LoRA adapters: parameter-efficient fine-tuning of the DiffewS UNet.

No reference equivalent — the reference's only training mode is full
fine-tuning of the 866M-param UNet
(`train_tools/train_icl_multitask_nocrop_nearest_nshot_v3.py:1186`,
`unet.parameters()` straight into AdamW).  LoRA trains rank-r factors
`ΔW = (α/r)·A@B` on the attention (optionally FFN) projections instead:
~1.6M trainable params at rank 8, a ~300× smaller optimizer state, and
checkpoints that remain byte-compatible with the reference layout because
the merged `W + ΔW` is what gets written (`cli/train.py --lora_rank`).

Design (JAX-functional, not module patching): the adapter tree is a
SPARSE mirror of the param tree — only adapted modules appear, each as
`{"lora_a": (in, r) f32, "lora_b": (r, out) f32}` — and `merge_lora`
produces a merged UNet tree *inside the jitted step*, so the base weights
stay frozen jit arguments (never donated, never duplicated beyond the
compute-dtype cast the full-FT path already pays) and gradients flow only
through the factors.  B is zero-initialized: step 0 is exactly the base
model.
"""

from __future__ import annotations

import zlib
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.training import ema as ema_lib
from diffews_tpu.training import state as state_lib


def attn_target(path: str) -> bool:
    """Default adaptation sites: every attention projection (self- AND
    cross-attention q/k/v/out — the community-standard SD LoRA target
    set)."""
    return (".attn1." in path or ".attn2." in path) and any(
        path.endswith(s) for s in (".to_q", ".to_k", ".to_v", ".to_out.0"))


def attn_ff_target(path: str) -> bool:
    """Wider set: attention projections + GEGLU feed-forward +
    transformer proj_in/out (the joint pass's full matmul surface, same
    sites as `ops.quant.unet_attention_linear` plus attn2)."""
    return attn_target(path) or ".ff." in path \
        or path.endswith(".proj_in") or path.endswith(".proj_out")


def target_filter(name: str) -> Callable[[str], bool]:
    return {"attn": attn_target, "attn+ff": attn_ff_target}[name]


def _is_linear(node) -> bool:
    return (isinstance(node, dict) and "kernel" in node
            and getattr(node["kernel"], "ndim", 0) == 2)


def init_lora(rng: jax.Array, params: dict, rank: int,
              path_filter: Callable[[str], bool] = attn_target) -> dict:
    """Sparse adapter tree over `params`: every 2-D-kernel linear whose
    tree path passes `path_filter` gets `{"lora_a", "lora_b"}`.  A is
    N(0, 1/sqrt(in)) (per-path key, stable across runs via crc32 of the
    path), B is zeros — the initial ΔW is exactly 0."""

    def rec(node, path):
        if _is_linear(node):
            if not path_filter(path):
                return None
            din, dout = node["kernel"].shape
            k = jax.random.fold_in(rng, zlib.crc32(path.encode()))
            a = jax.random.normal(k, (din, rank), jnp.float32) / jnp.sqrt(din)
            return {"lora_a": a, "lora_b": jnp.zeros((rank, dout), jnp.float32)}
        if isinstance(node, dict):
            sub = {k: rec(v, f"{path}.{k}" if path else k)
                   for k, v in node.items()}
            sub = {k: v for k, v in sub.items() if v is not None}
            return sub or None
        return None

    out = rec(params, "")
    if not out:
        raise ValueError("no LoRA target sites matched the param tree")
    return out


def merge_lora(params: dict, lora: dict, scale: float) -> dict:
    """Params tree with `kernel + scale·(A@B)` at every adapted site (f32
    accumulation, result in the kernel's dtype).  Differentiable w.r.t.
    the factors; cheap enough to run inside every train step (each ΔW is
    one (in, r)@(r, out) matmul)."""

    def rec(p, l):
        if l is None:
            return p
        if _is_linear(p) and "lora_a" in l:
            k = p["kernel"]
            delta = (l["lora_a"].astype(jnp.float32)
                     @ l["lora_b"].astype(jnp.float32)) * scale
            out = dict(p)
            out["kernel"] = (k.astype(jnp.float32) + delta).astype(k.dtype)
            return out
        if isinstance(p, dict):
            return {key: rec(v, l.get(key)) for key, v in p.items()}
        return p

    return rec(params, lora)


def lora_scale(cfg: state_lib.TrainerConfig) -> float:
    alpha = cfg.lora_alpha if cfg.lora_alpha is not None else float(cfg.lora_rank)
    return alpha / cfg.lora_rank


def make_lora_train_step(cfg: state_lib.TrainerConfig, unet_cfg: UNetConfig,
                         vae_cfg: VAEConfig):
    """Returns `step_fn(state, batch, rng, base_c, vae_p, text_e)`.

    Same objective/optimizer/EMA plumbing as `state.make_train_step`, but
    `state.params` is the adapter tree and the frozen compute-dtype base
    UNet (`base_c`) is a jit argument — the merge happens in-graph, so XLA
    fuses ΔW into the weight loads and the optimizer state is rank-sized.
    """
    tx = state_lib.make_optimizer(cfg)
    episode_loss = state_lib.make_episode_loss(cfg, unet_cfg, vae_cfg)
    scale = lora_scale(cfg)

    def loss_fn(lora, base_c, vae_params_c, text_embed, micro, rng):
        merged = merge_lora(base_c, lora, scale)
        return episode_loss(merged, vae_params_c, text_embed, micro, rng)

    def step_fn(state: state_lib.TrainState, batch, rng, base_c, vae_p,
                text_e) -> Tuple[state_lib.TrainState, dict]:
        gas = batch["query"].shape[0]
        rngs = jax.random.split(rng, gas)
        loss, grads = state_lib.accumulate_grads(
            loss_fn, state.params, (base_c, vae_p, text_e), batch, rngs, gas)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (ema_lib.update(state.ema, params)
               if state.ema is not None else None)
        gnorm = optax.global_norm(grads)
        new_state = state_lib.TrainState(params, opt_state, ema,
                                         state.step + 1)
        metrics = {"loss": loss, "grad_norm": gnorm}
        if cfg.max_nonfinite_steps > 0:  # see make_train_step
            metrics["notfinite_count"] = opt_state.notfinite_count
            metrics["total_notfinite"] = opt_state.total_notfinite
        return new_state, metrics

    return step_fn
