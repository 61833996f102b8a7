"""Train state and the jitted in-context training step.

TPU-native counterpart of the reference training loop's inner step
(`train_tools/train_icl_multitask_nocrop_nearest_nshot_v3.py:1320-1396`):

  - all four VAE encodes (support RGB / support mask / query RGB / query
    mask) fold into ONE batched `latent_dist.sample()` encode (`:1347-1358`);
  - fixed timestep t = 1 * train_timestep, no noise added (`:1365`);
  - frozen empty-prompt text embedding, padded to 77 tokens (`:1319,1368`);
  - regression target is the NEGATIVE query-mask latent with plain MSE
    (`:1371,1384`);
  - the support("ref") pass happens inside the joint UNet forward; gradients
    reach it through the fused K/V so the reference's `ref_pred * 0.` DDP
    graph hack (`:1381`) has no equivalent;
  - variable 1..max_nshot training uses a host-sampled `shot_mask` over
    padded supports (one jit, static shapes) instead of re-tracing per shot
    count (`:1336-1340`);
  - gradient accumulation is a `lax.scan` over the micro-batch axis inside
    the jit (grad-mean), replacing `accelerator.accumulate` (`:1323`);
  - grad-clip 1.0 + AdamW(1e-5, wd 1e-2) + polynomial decay (`:1188-1223`);
  - data parallelism: batch axes sharded over the mesh "data" axis; XLA
    inserts the gradient psum (no NCCL/DDP machinery).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.training import ema as ema_lib
from diffews_tpu.training import lr as lr_lib


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    learning_rate: float = 1e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    adam_weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    lr_scheduler: str = "polynomial"
    lr_warmup_steps: int = 0
    lr_power: float = 1.0  # polynomial decay power (`--lr_scheduler_power`)
    max_train_steps: int = 20000
    gradient_accumulation_steps: int = 4
    train_timestep: int = 1
    max_nshot: int = 1
    use_ema: bool = False
    compute_dtype: Any = jnp.bfloat16
    # Adam first-moment storage dtype.  bf16 halves the momentum footprint
    # (-1.73 GB at SD-2.1 scale — the margin that lets 512px training fit a
    # 16 GB v5e chip; momentum is insensitive to the mantissa loss).  Set to
    # jnp.float32 for bit-level optimizer parity with the reference.
    adam_mu_dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = True
    # Failure containment (no reference equivalent — SURVEY.md §5 lists no
    # failure detection): wrap the optimizer in optax.apply_if_finite so a
    # non-finite loss/grad step is skipped instead of poisoning the params;
    # training aborts only after this many consecutive bad steps.
    max_nonfinite_steps: int = 10
    # LoRA (training/lora.py; no reference equivalent): 0 = full fine-tuning
    # (the reference's only mode).  rank > 0 trains low-rank adapters on the
    # UNet's attention projections instead of the 866M base weights.
    lora_rank: int = 0
    lora_alpha: Optional[float] = None  # scale = alpha / rank; None -> rank
    lora_targets: str = "attn"  # "attn" | "attn+ff"
    # Train the experimental ATTN-MASK conditioning variant
    # (`diffews/models/unet_2d_condition_attn.py` +
    # `attention_processor_attnmask.py`): support masks become per-level
    # attention key biases (`unet.forward` `ref_mask`) instead of a
    # VAE-encoded latent channel; the support stream shares the 4-ch
    # `conv_in` and `conv_in_ref` is unused (frozen at init).  The
    # reference ships this variant untrained; our capability harness
    # validates it end-to-end (tools/train_capability.py --attn_mask_variant).
    attn_mask_variant: bool = False
    # Reference quirk parity: the diffusers-example loop the reference forked
    # calls `lr_scheduler.step()` once per MICRO-batch while counting
    # `max_train_steps` in optimizer steps (`train_icl_*_v3.py:1217-1223,
    # 1395`), so the schedule advances gradient_accumulation_steps (x
    # num_processes) faster than the optimizer.  1 = correct schedule
    # (default); set to gas*nproc to reproduce the reference exactly.
    lr_steps_per_opt_step: int = 1


class TrainState(NamedTuple):
    params: dict
    opt_state: Any
    ema: Optional[ema_lib.EMAState]
    step: jax.Array


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    base_schedule = lr_lib.get_schedule(
        cfg.lr_scheduler, cfg.learning_rate, cfg.max_train_steps,
        cfg.lr_warmup_steps, power=cfg.lr_power,
    )
    k = cfg.lr_steps_per_opt_step
    schedule = base_schedule if k == 1 else (lambda step: base_schedule(step * k))
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
            mu_dtype=cfg.adam_mu_dtype,
        ),
    )
    if cfg.max_nonfinite_steps > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=cfg.max_nonfinite_steps)
    return tx


def init_state(cfg: TrainerConfig, unet_params: dict) -> TrainState:
    tx = make_optimizer(cfg)
    opt_state = tx.init(unet_params)
    ema = ema_lib.init(unet_params) if cfg.use_ema else None
    return TrainState(unet_params, opt_state, ema, jnp.zeros((), jnp.int32))


def make_episode_loss(cfg: TrainerConfig, unet_cfg: UNetConfig,
                      vae_cfg: VAEConfig):
    """Returns `loss(params_c, vae_params_c, text_embed, micro, rng)` — the
    reference's in-context regression objective on ONE micro-batch
    (`train_icl_*_v3.py:1336-1384`; see `make_train_step` for the field
    contract).  `params_c` is the UNet tree already in the compute dtype —
    the caller decides how it is produced (a plain cast for full
    fine-tuning, a LoRA merge for `training.lora`)."""
    dt = cfg.compute_dtype

    def norm_img(x):
        if x.dtype == jnp.uint8:
            x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        return x.astype(dt)

    def norm_mask(m, img_ndim):
        if m.ndim == img_ndim - 1:  # binary (..., H, W) {0,1}
            mf = m.astype(jnp.float32) * 2.0 - 1.0
            return jnp.broadcast_to(mf[..., None], mf.shape + (3,)).astype(dt)
        return norm_img(m)

    def loss(params_c, vae_params_c, text_embed, micro, rng):
        q = norm_img(micro["query"])
        qm3 = norm_mask(micro["q_mask3"], micro["query"].ndim)
        sup = norm_img(micro["supports"])
        sm3 = norm_mask(micro["s_mask3"], micro["supports"].ndim)
        shot_mask = micro["shot_mask"]
        b, n = sup.shape[0], sup.shape[1]
        streams = [
            q,
            qm3,
            sup.reshape((b * n,) + sup.shape[2:]),
        ]
        if not cfg.attn_mask_variant:
            streams.append(sm3.reshape((b * n,) + sm3.shape[2:]))
        flat = jnp.concatenate(streams, axis=0)
        # Frozen VAE: stochastic posterior sample (train path, `:1347-1358`).
        lat = jax.lax.stop_gradient(
            vae.sample_latent(vae_params_c, vae_cfg, flat, rng,
                              attn_impl=cfg.attn_impl)
        )
        lh, lw = lat.shape[1:3]
        q_lat = lat[:b]
        qm_lat = lat[b : 2 * b]
        s_lat = lat[2 * b : 2 * b + b * n].reshape(b, n, lh, lw, -1)
        if cfg.attn_mask_variant:
            # variant: support mask -> per-level attention key biases
            # (no mask latent; support stream shares the 4-ch conv_in)
            ref = s_lat
            ref_mask = (sm3.astype(jnp.float32).mean(axis=-1) > 0.0
                        ).astype(jnp.float32)  # (B, N, H, W)
        else:
            sm_lat = lat[2 * b + b * n :].reshape(b, n, lh, lw, -1)
            ref = jnp.concatenate([s_lat, sm_lat], axis=-1)
            ref_mask = None

        ctx = jnp.broadcast_to(text_embed, (b,) + text_embed.shape[1:]).astype(dt)
        pred = unet.forward(
            params_c, unet_cfg, q_lat, cfg.train_timestep, ctx,
            ref_sample=ref, shot_mask=shot_mask, ref_mask=ref_mask,
            attn_impl=cfg.attn_impl, remat=cfg.remat,
        )
        target = -qm_lat
        return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    return loss


def accumulate_grads(loss_fn, train_params, extra, batch, rngs, gas):
    """(loss, grads) of `loss_fn(train_params, *extra, micro, rng)` averaged
    over the `gas` leading micro-batch axis of `batch` — grads w.r.t.
    `train_params` only (argnum 0)."""
    if gas == 1:
        # no accumulator tree: saves a full fp32 grad-sized buffer
        # (3.5 GB at SD-2.1 scale — the difference between fitting and
        # OOMing 512px training on a 16 GB chip)
        micro = jax.tree_util.tree_map(lambda x: x[0], batch)
        return jax.value_and_grad(loss_fn)(
            train_params, *extra, micro, rngs[0]
        )

    def micro_step(carry, inp):
        micro, r = inp
        l, grads = jax.value_and_grad(loss_fn)(train_params, *extra, micro, r)
        acc_loss, acc_grads = carry
        acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
        return (acc_loss + l, acc_grads), None

    zero_grads = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), train_params
    )
    (loss_sum, grads), _ = jax.lax.scan(
        micro_step, (jnp.zeros((), jnp.float32), zero_grads), (batch, rngs)
    )
    grads = jax.tree_util.tree_map(lambda g: g / gas, grads)
    return loss_sum / gas, grads


def make_train_step(
    cfg: TrainerConfig,
    unet_cfg: UNetConfig,
    vae_cfg: VAEConfig,
):
    """Returns `step_fn(state, batch, rng, vae_p, text_e) -> (state, metrics)`.

    The frozen VAE params (`vae_p`, cast to the compute dtype) and text
    embedding (`text_e`, (1,77,D)) are jit ARGUMENTS — closing over them
    would inline gigabytes of weights into the HLO as constants and blow up
    compilation at SD-2.1 scale.

    `batch` fields, each with leading (gas, B) axes:
      query:    (G, B, H, W, 3) in [-1, 1] — or raw uint8 0..255 (the exact
                host-transform f32 arithmetic then runs in-graph, cutting
                the h2d upload 4x; see `DiffewsPipeline._x0_latent`)
      q_mask3:  (G, B, H, W, 3) mask as 3-channel [-1, 1] — or binary
                (G, B, H, W) {0,1} any dtype, folded in-graph (12x less h2d)
      supports: (G, B, N, H, W, 3) like query
      s_mask3:  (G, B, N, H, W, 3) or binary (G, B, N, H, W) like q_mask3
      shot_mask:(G, B, N) bool
    """
    tx = make_optimizer(cfg)
    dt = cfg.compute_dtype
    episode_loss = make_episode_loss(cfg, unet_cfg, vae_cfg)

    def loss_fn(params, vae_params_c, text_embed, micro, rng):
        params_c = jax.tree_util.tree_map(lambda x: x.astype(dt), params)
        return episode_loss(params_c, vae_params_c, text_embed, micro, rng)

    def step_fn(state: TrainState, batch, rng, vae_p, text_e) -> Tuple[TrainState, dict]:
        gas = batch["query"].shape[0]
        rngs = jax.random.split(rng, gas)
        loss, grads = accumulate_grads(
            loss_fn, state.params, (vae_p, text_e), batch, rngs, gas)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            ema_lib.update(state.ema, params) if state.ema is not None else None
        )
        gnorm = optax.global_norm(grads)
        new_state = TrainState(params, opt_state, ema, state.step + 1)
        metrics = {"loss": loss, "grad_norm": gnorm}
        if cfg.max_nonfinite_steps > 0:
            # failure-detection observability: apply_if_finite's counters
            # (its state wraps the whole chain) say whether this run has
            # been silently skipping nonfinite steps — surfaced by the CLI
            # log so containment is visible, not just bounded
            metrics["notfinite_count"] = opt_state.notfinite_count
            metrics["total_notfinite"] = opt_state.total_notfinite
        return new_state, metrics

    return step_fn
