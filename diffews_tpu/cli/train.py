"""In-context n-shot training CLI.

TPU-native counterpart of
`train_tools/train_icl_multitask_nocrop_nearest_nshot_v3.py` (flags mirror
the canonical scripts `scripts/train_*.sh`).  Differences by design:

  - HF Accelerate DDP/NCCL -> `jax.sharding` data parallelism on a device
    mesh (XLA inserts the gradient psum); no process launcher needed.
  - fp16 + xformers -> bf16 + fused-KV attention (XLA or Pallas).
  - gradient accumulation happens inside the jitted step (lax.scan).
  - `--benchmark` accepts a comma-separated list for multitask training
    (e.g. "lvis,paco_part" — the reference trains these via separate
    scripts with the multitask trainer).

Checkpoints are written in the reference's `checkpoint-{step}/unet` diffusers
layout, so they are directly consumable by the reference eval and ours.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import random
import signal
import threading
import time

import numpy as np

from diffews_tpu.data.dataset import FSSDataset


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("DiffewS-TPU in-context training")
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True,
                   help="base checkpoint (ref8inchannels surgery output)")
    p.add_argument("--scheduler_load_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="logs/diffews-train")
    p.add_argument("--seed", type=int, default=None)
    # data
    p.add_argument("--datapath", "--train_data_dir", dest="datapath",
                   type=str, default="datasets")
    p.add_argument("--benchmark", type=str, default="coco",
                   help="benchmark or comma-list for multitask")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1, help="max shots (pad+mask)")
    p.add_argument("--resolution", "--img_size", dest="resolution", type=int, default=512)
    p.add_argument("--dataloader_num_workers", type=int, default=2)
    # optimization
    p.add_argument("--train_batch_size", type=int, default=1,
                   help="per-device episode batch")
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--max_train_steps", type=int, default=20000)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_scheduler", type=str, default="polynomial")
    p.add_argument("--lr_scheduler_power", type=float, default=1.0)
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--reference_lr_quirk", action="store_true",
                   help="advance the LR schedule gas x faster, bit-matching "
                        "the reference's per-micro-batch scheduler stepping")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--train_timestep", type=int, default=1)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "bf16", "fp16"],
                   help="'fp16' (the reference's choice) runs as bf16 — "
                        "TPU-native mixed precision needs no loss scaling")
    p.add_argument("--attn_impl", type=str, default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--attn_mask_variant", action="store_true",
                   help="train the experimental attn-mask conditioning "
                        "variant (support masks as per-level attention key "
                        "biases, `unet_2d_condition_attn.py`); evaluate "
                        "checkpoints with `cli/evaluate.py "
                        "--attn_mask_variant`")
    p.add_argument("--no_remat", action="store_true")
    # parallelism
    p.add_argument("--num_data_shards", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host pod training); "
                        "train_batch_size is the GLOBAL batch, split evenly "
                        "across processes")
    p.add_argument("--num_model_shards", type=int, default=1,
                   help="tensor-parallel mesh size")
    # LoRA (no reference equivalent — the reference only full-fine-tunes,
    # `train_icl_*_v3.py:1186`): rank-r adapters on the attention
    # projections; checkpoints still write the MERGED model in diffusers
    # layout, so eval/`--unet_ckpt_path` work unchanged.
    p.add_argument("--lora_rank", type=int, default=0,
                   help="0 = full fine-tuning; >0 trains LoRA adapters")
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="LoRA scale numerator (default: rank, i.e. scale 1)")
    p.add_argument("--lora_targets", type=str, default="attn",
                   choices=["attn", "attn+ff"])
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO/FSDP: shard params + Adam moments + EMA over "
                        "the data axis (per-chip state HBM scales 1/n_data; "
                        "XLA all-gathers weights per layer and reduce-"
                        "scatters grads). The reference's DDP replicates "
                        "everything per GPU — no equivalent.")
    # checkpointing / logging
    p.add_argument("--checkpointing_steps", type=int, default=2000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="'latest' or a checkpoint-N dir")
    p.add_argument("--report_to", type=str, default="none",
                   choices=["none", "tensorboard", "wandb"],
                   help="experiment tracker (reference `--report_to`, "
                        "`train_icl_*_v3.py:306-314`); wandb degrades to a "
                        "warning when the package is not installed")
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--metrics_jsonl", type=str, default="",
                   help="append {step, loss, steps_per_s, wall_s, "
                        "total_notfinite} at every logging interval — a "
                        "committable loss-curve/step-time artifact for "
                        "sustained runs (appends across resumes)")
    p.add_argument("--profile_step", type=int, default=0,
                   help="capture a device profiler trace starting at this "
                        "optimizer step (0 = off); view with tensorboard/"
                        "xprof on {output_dir}/profile")
    p.add_argument("--profile_num_steps", type=int, default=3,
                   help="steps to include in the --profile_step trace")
    # periodic validation (counterpart of log_validation + eval_results.txt,
    # `train_icl_*_v3.py:173-326,1436-1441` — enabled here, unlike the
    # reference where it is mostly commented out)
    p.add_argument("--validation_steps", type=int, default=0,
                   help="run val episodes every N steps (0 = off)")
    p.add_argument("--validation_episodes", type=int, default=50)
    p.add_argument("--validation_image_grids", type=int, default=4,
                   help="save the first N validation episodes as image "
                        "strips under {output_dir}/validation/ (reference "
                        "log_validation grids, `train_icl_*_v3.py:173-326`; "
                        "0 = off)")
    # -- accepted-for-compatibility no-ops (reference `train_icl_*_v3.py`
    # flags with no TPU equivalent; scripts drop in unchanged) --
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true",
                   help="no-op: the Pallas flash kernel is the default")
    p.add_argument("--allow_tf32", action="store_true",
                   help="no-op: TPU matmuls are bf16/f32 natively")
    p.add_argument("--tracker_project_name", type=str, default=None,
                   help="wandb project name (reference accelerate tracker "
                        "name, `train_icl_*_v3.py:306-314`)")
    p.add_argument("--cache_dir", type=str, default=None,
                   help="no-op (HF hub cache; checkpoints are local dirs)")
    for col in ("image_ref_column", "image_tag_column",
                "conditioning_image_ref_column",
                "conditioning_image_tag_column", "caption_column"):
        p.add_argument(f"--{col}", type=str, default=None,
                       help="no-op (HF-datasets column naming; the episodic "
                            "FSS loader has no column concept)")
    return p


def _install_preemption_handler():
    """Graceful-preemption contract for managed TPU fleets (GKE/GCE send
    SIGTERM with a grace period before reclaiming a preemptible/spot VM;
    SLURM sends it at time-limit): the FIRST SIGTERM/SIGINT requests a
    clean stop — finish the in-flight optimizer step, write a final
    checkpoint, exit 0 — and, because the training stream is counter-keyed,
    `--resume_from_checkpoint latest` continues the EXACT stream with zero
    lost work beyond the current step.  A SECOND signal restores the
    default disposition and re-delivers itself, so a wedged run can still
    be killed.  The reference has no preemption story (an interrupted
    accelerate run loses everything since its last cadence save).

    Returns `(stop_event, restore_fn)`.  Signal handlers can only be
    installed from the main thread; elsewhere (e.g. a library caller
    driving `main()` from a worker thread) this degrades to a no-op event.
    """
    stop = threading.Event()
    prev = {}

    def handler(signum, frame):
        if stop.is_set():  # second signal: give up gracefulness
            signal.signal(signum, prev.get(signum, signal.SIG_DFL))
            os.kill(os.getpid(), signum)
            return
        print(f"[preempt] received {signal.Signals(signum).name}: finishing "
              "the current step, then checkpointing and exiting "
              "(resume with --resume_from_checkpoint latest)", flush=True)
        stop.set()

    try:
        for s in (signal.SIGTERM, signal.SIGINT):
            prev[s] = signal.signal(s, handler)
    except ValueError:  # not the main thread
        return stop, lambda: None

    def restore():
        for s, h in prev.items():
            signal.signal(s, h)

    return stop, restore


def _mix(*parts: int) -> int:
    """Deterministic 64-bit seed from integer parts (hash() is salted per
    process and unusable for cross-run determinism)."""
    import hashlib

    h = hashlib.blake2b(",".join(str(p) for p in parts).encode(),
                        digest_size=8)
    return int.from_bytes(h.digest(), "little")


def _episode_to_streams(batch, rng: random.Random, max_nshot: int):
    """Host-side per-step tensor prep, matching `train_icl_*_v3.py:1325-1340`:
    masks to 3-channel [-1,1]; random 1..max_nshot shot subset -> bool mask
    over padded supports (mask semantics == physically dropping the shots).

    With raw-uint8 episodes (`FSSDataset.initialize(raw_images=True)` — the
    train CLI default) images stay uint8 HWC and masks stay binary uint8;
    normalization/folding runs inside the train step (identical arithmetic,
    ~8x smaller h2d upload)."""
    if batch["query_img"].dtype == np.uint8:  # raw path: already HWC
        q, sup = batch["query_img"], batch["support_imgs"]
        qm = batch["query_mask"].astype(np.uint8)
        sm = batch["support_masks"].astype(np.uint8)
    else:
        q = np.moveaxis(batch["query_img"], 1, -1).astype(np.float32)
        sup = np.moveaxis(batch["support_imgs"], 2, -1).astype(np.float32)
        qm = (np.repeat(batch["query_mask"][:, :, :, None], 3, -1)
              * 2.0 - 1.0).astype(np.float32)
        sm = (np.repeat(batch["support_masks"][:, :, :, :, None], 3, -1)
              * 2.0 - 1.0).astype(np.float32)
    b, n = sup.shape[:2]
    shot_mask = np.zeros((b, n), dtype=bool)
    for i in range(b):
        k = rng.randint(1, max_nshot)
        shot_mask[i, rng.sample(range(n), k)] = True
    return q, qm, sup, sm, shot_mask


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if os.environ.get("DIFFEWS_PLATFORM"):
        # Subprocess escape hatch (same pattern as cli/evaluate.py:240):
        # sitecustomize pins JAX_PLATFORMS=axon and env vars cannot
        # override it, but an in-process config update can — used by CI
        # subprocess runs (measure_baseline self-train, distributed
        # capability arms).  DIFFEWS_CPU_DEVICES additionally requests N
        # virtual CPU devices (the multi-device mesh for DP/FSDP arms).
        jax.config.update("jax_platforms", os.environ["DIFFEWS_PLATFORM"])
        if os.environ.get("DIFFEWS_CPU_DEVICES"):
            jax.config.update("jax_num_cpu_devices",
                              int(os.environ["DIFFEWS_CPU_DEVICES"]))
    import jax.numpy as jnp

    from diffews_tpu import checkpoint as ckpt_lib
    from diffews_tpu.models import clip_text
    from diffews_tpu.parallel import mesh as mesh_lib
    from diffews_tpu.training import checkpoints as tck
    from diffews_tpu.training.state import TrainerConfig, init_state, make_train_step

    # ---- multi-host bootstrap (before any device use) ----
    proc_idx, proc_cnt = mesh_lib.maybe_initialize_distributed(args.multihost)
    is_main = proc_idx == 0
    if args.train_batch_size % proc_cnt:
        raise SystemExit(f"train_batch_size {args.train_batch_size} not divisible "
                         f"by process count {proc_cnt}")
    local_bs = args.train_batch_size // proc_cnt

    if args.seed is not None:
        # per-process seed offset: each host samples its own episodes (the
        # DDP-sampler equivalent); shot subsets likewise decorrelate
        random.seed(args.seed + proc_idx)
        np.random.seed(args.seed + proc_idx)
    # All training-stream randomness is counter-keyed rather than stateful:
    # episode sampling by (seed, proc, benchmark, batch index) via the
    # loader's batch_seed mode, shot subsets by (seed, proc, micro index),
    # the noise key by fold_in(base, step).  The whole stream is a pure
    # function of (seed, global_step), so resume continues the EXACT stream
    # an uninterrupted run would see with no RNG state in checkpoints (the
    # reference restores accelerate's pickled RNG blobs for a weaker
    # restart-the-epoch guarantee, `train_icl_*_v3.py:1281-1306`), and the
    # periodic-validation protocol (which replays the global seed-0 episode
    # sequence) cannot perturb training.
    base_seed = args.seed if args.seed is not None else 0

    # ---- models ----
    bundle = ckpt_lib.load_pipeline_bundle(
        args.pretrained_model_name_or_path, scheduler_dir=args.scheduler_load_path
    )
    ids77 = clip_text.empty_prompt_ids(bundle.text_cfg, pad_to=77)
    text_embed = clip_text.forward(bundle.text_params, bundle.text_cfg, ids77)

    tcfg = TrainerConfig(
        learning_rate=args.learning_rate,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_epsilon=args.adam_epsilon,
        adam_weight_decay=args.adam_weight_decay,
        max_grad_norm=args.max_grad_norm,
        lr_scheduler=args.lr_scheduler,
        lr_power=args.lr_scheduler_power,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        train_timestep=args.train_timestep,
        max_nshot=args.nshot,
        use_ema=args.use_ema,
        # fp16 (reference default) runs as bf16: TPU-native, no loss scaling
        compute_dtype=(jnp.bfloat16 if args.mixed_precision in ("bf16", "fp16")
                       else jnp.float32),
        attn_impl=args.attn_impl,
        attn_mask_variant=args.attn_mask_variant,
        remat=not args.no_remat,
        lr_steps_per_opt_step=(
            args.gradient_accumulation_steps if args.reference_lr_quirk else 1
        ),
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        lora_targets=args.lora_targets,
    )

    # ---- mesh + sharding ----
    m = mesh_lib.make_mesh(
        n_data=args.num_data_shards or None, n_model=args.num_model_shards
    )
    state_sh = None
    base_c = None  # LoRA mode: frozen compute-dtype base UNet (jit arg)
    if args.lora_rank > 0:
        if args.fsdp:
            raise SystemExit("--fsdp with --lora_rank is pointless (the "
                             "adapter state is rank-sized); drop one")
        from diffews_tpu.training import lora as lora_lib

        base_c = jax.tree_util.tree_map(
            lambda x: x.astype(tcfg.compute_dtype), bundle.unet_params)
        # f32 base stays on HOST for checkpoint merges: the written unet/
        # must carry f32 weights like a full-FT checkpoint (merging from
        # the compute-dtype base_c would silently round every weight to
        # bf16 in an artifact documented as reference-compatible)
        base_host = jax.device_get(bundle.unet_params)
        lora0 = lora_lib.init_lora(
            jax.random.PRNGKey(args.seed or 0), bundle.unet_params,
            args.lora_rank, lora_lib.target_filter(args.lora_targets))
        n_lora = sum(x.size for x in jax.tree_util.tree_leaves(lora0))
        print(f"LoRA rank {args.lora_rank} ({args.lora_targets}): "
              f"{n_lora/1e6:.2f}M trainable params")
        state = init_state(tcfg, lora0)
        step_fn = jax.jit(
            lora_lib.make_lora_train_step(tcfg, bundle.unet_cfg,
                                          bundle.vae_cfg),
            donate_argnums=(0,),
        )
    elif args.fsdp:
        # Born-sharded: no replicated param/optimizer copy ever exists on
        # any chip (parallel/mesh.py::init_state_fsdp); the sharding tree
        # pins the step's output layout so donated shards are reused.
        state, state_sh = mesh_lib.init_state_fsdp(
            tcfg, bundle.unet_params, m,
            tensor_parallel=args.num_model_shards > 1,
        )
    else:
        state = init_state(tcfg, bundle.unet_params)
        state = state._replace(
            params=mesh_lib.shard_params(state.params, m,
                                         args.num_model_shards > 1)
        )
    if args.lora_rank == 0:
        step_fn = jax.jit(
            make_train_step(tcfg, bundle.unet_cfg, bundle.vae_cfg),
            donate_argnums=(0,),
            out_shardings=(state_sh, None) if state_sh is not None else None,
        )
    vae_p = jax.tree_util.tree_map(
        lambda x: x.astype(tcfg.compute_dtype), bundle.vae_params
    )
    text_e = jnp.asarray(text_embed)

    def merged_unet_params(st):
        """Full UNet tree for validation/checkpointing: the live params in
        full-FT mode, base + adapters in LoRA mode."""
        from diffews_tpu.training import lora as lora_lib

        if args.lora_rank == 0:
            return st.params
        return lora_lib.merge_lora(base_c, st.params,
                                   lora_lib.lora_scale(tcfg))
    # HBM hygiene at SD-2.1 scale (16 GB chip, observed RESOURCE_EXHAUSTED):
    #  - the bundle's f32 UNet tree duplicates `state.params` -> drop it
    #    (validation grafts the live training params back in);
    #  - the CLIP text tower (~1.4 GB f32) is only needed once for the
    #    frozen empty-prompt embedding -> offload to host (validation
    #    re-uploads lazily if it ever builds a pipeline);
    #  - the f32 VAE is superseded by the bf16 working copy -> host too.
    bundle.unet_params = None
    if bundle.text_params is not None:
        bundle.text_params = jax.device_get(bundle.text_params)
    bundle.vae_params = jax.device_get(bundle.vae_params)

    # ---- resume ----
    global_step = 0
    resumed_in_output_dir = False
    if args.resume_from_checkpoint:
        ckpt = (
            tck.latest_checkpoint(args.output_dir)
            if args.resume_from_checkpoint == "latest"
            else args.resume_from_checkpoint
        )
        if ckpt:
            resumed_in_output_dir = (
                os.path.dirname(os.path.abspath(ckpt))
                == os.path.abspath(args.output_dir))
            state, global_step = tck.load_checkpoint(ckpt, state,
                                                     lora=args.lora_rank > 0)
            if state_sh is not None:
                # restore returns host arrays; re-commit the FSDP layout
                # (make_array_from_callback also works when the sharding
                # spans other processes — multi-host FSDP)
                state = mesh_lib.put_sharded_host_tree(state, state_sh)
            print(f"resumed from {ckpt} @ step {global_step}")

    # ---- data: round-robin over benchmarks (multitask) ----
    # raw uint8 episodes; the train step normalizes in-graph (same math)
    FSSDataset.initialize(args.resolution, args.datapath, raw_images=True)
    benchmarks = [b.strip() for b in args.benchmark.split(",") if b.strip()]
    loaders = [
        FSSDataset.build_dataloader(
            b, local_bs, args.dataloader_num_workers,
            args.fold, "trn", args.nshot,
            batch_seed=_mix(base_seed, proc_idx, bi),
        )
        for bi, b in enumerate(benchmarks)
    ]
    # resume continues the exact episode stream: micro-batch m draws from
    # stream m % n, so after `consumed` micro-batches stream i has served
    # ceil((consumed - i) / n) batches
    consumed = global_step * args.gradient_accumulation_steps
    for i, l in enumerate(loaders):
        n = len(benchmarks)
        l.set_position(consumed // n + (1 if i < consumed % n else 0))

    def endless(loader):
        while True:
            yield from loader

    streams = [endless(l) for l in loaders]
    rot = consumed % len(streams)
    robin = itertools.cycle(streams[rot:] + streams[:rot])

    writer = None
    wandb_run = None
    if args.report_to == "tensorboard":
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, "tb"))
    elif args.report_to == "wandb":
        try:
            import wandb

            wandb_run = wandb.init(
                project=args.tracker_project_name or "diffews_tpu",
                dir=args.output_dir, config=vars(args),
            )
        except ImportError:
            print("WARNING: --report_to wandb requested but wandb is not "
                  "installed; continuing without a tracker")

    def log_scalar(tag, value, step):
        if writer:
            writer.add_scalar(tag, value, step)
        if wandb_run:
            wandb_run.log({tag: value}, step=step)

    def log_image(tag, img_hwc_uint8, step):
        if writer:
            writer.add_image(tag, img_hwc_uint8, step, dataformats="HWC")
        if wandb_run:
            import wandb

            wandb_run.log({tag: wandb.Image(img_hwc_uint8)}, step=step)

    # ---- lazy validation pipeline (shares the frozen VAE/text weights;
    # UNet params are swapped in from the live train state) ----
    val_state = {}

    def run_validation(unet_params, step):
        import jax.numpy as jnp

        from diffews_tpu.evaluation import AverageMeter, Evaluator
        from diffews_tpu.pipeline import DiffewsPipeline

        if "pipe" not in val_state:
            import copy as _copy

            # bundle.unet_params was dropped to save HBM; graft the live
            # training params (merged with the adapters in LoRA mode) in
            # for pipeline construction
            vb = _copy.copy(bundle)
            vb.unet_params = unet_params
            val_state["pipe"] = DiffewsPipeline(
                vb, compute_dtype=tcfg.compute_dtype, attn_impl=args.attn_impl,
                attn_mask_variant=args.attn_mask_variant,
            )
            val_state["loader"] = FSSDataset.build_dataloader(
                benchmarks[0], 1, 0, args.fold, "test", min(args.nshot, 5)
            )
        pipe = val_state["pipe"]
        pipe.unet_params = jax.tree_util.tree_map(
            lambda x: x.astype(tcfg.compute_dtype), unet_params
        )
        loader = val_state["loader"]
        meter = AverageMeter(loader.dataset.benchmark, loader.dataset.class_ids)
        # replay the seeded eval protocol through a PRIVATE RandomState(0)
        # (identical draw sequence to `np.random.seed(0)` + global calls) —
        # reseeding the GLOBAL RNG here would race with, and hijack, any
        # concurrent global-RNG consumer
        loader.dataset.rng = np.random.RandomState(0)
        grid_dir = os.path.join(args.output_dir, "validation")
        for i, vb in zip(range(args.validation_episodes), loader):
            smask = vb["support_masks"].astype(np.uint8)
            out = pipe.predict(vb["query_img"], vb["support_imgs"], smask,
                               out_size=tuple(vb["query_mask"].shape[-2:]),
                               r_threshold=0.25)
            inter, union = Evaluator.classify_prediction(
                out.mask.astype(np.int64), vb["query_mask"],
                vb.get("query_ignore_idx"))
            meter.update(inter, union, vb["class_id"])
            if i < args.validation_image_grids:
                # reference log_validation's image grids
                # (`train_icl_*_v3.py:173-326`): [supports | query+gt |
                # query+pred] strip per episode, saved + sent to the tracker
                from PIL import Image as _Image

                from diffews_tpu.evaluation.vis import episode_strip

                strip = episode_strip(
                    vb["support_imgs"][0], vb["support_masks"][0],
                    vb["query_img"][0], vb["query_mask"][0],
                    out.mask[0].astype(np.uint8))
                os.makedirs(grid_dir, exist_ok=True)
                _Image.fromarray(strip).save(
                    os.path.join(grid_dir, f"step-{step}_ep-{i}.jpg"))
                log_image(f"validation/ep{i}", strip, step)
        miou, fb_iou, _ = meter.compute_iou()
        line = f"step {step}: val mIoU {miou:.2f} FB-IoU {fb_iou:.2f} ({args.validation_episodes} eps)"
        print(line)
        with open(os.path.join(args.output_dir, "eval_results.txt"), "a") as f:
            f.write(line + "\n")
        log_scalar("val_miou", miou, step)
        return miou

    def save_ckpt(step, background, write=True):
        """Checkpoint the state; in LoRA mode `unet/`/`unet_ema/` get the
        MERGED model (reference-layout-compatible) and the raw adapter
        trees ride in the aux msgpack for exact resume.

        Multi-host: called on EVERY process with write=is_main — the
        device->host snapshot all-gathers cross-process FSDP shards (a
        collective), and every process runs the same fetch sequence so the
        collectives stay ordered; only process 0 touches disk."""
        kw = {"write": write}
        if args.lora_rank > 0:
            from diffews_tpu.training import lora as lora_lib

            # merge on HOST from the f32 base (numpy trees through the same
            # merge_lora math): full-precision artifact, no HBM spike
            scale = lora_lib.lora_scale(tcfg)
            adapters = tck.host_fetch(state.params)
            kw["params_override"] = lora_lib.merge_lora(
                base_host, adapters, scale)
            kw["extra_aux"] = {"lora": adapters}
            if state.ema is not None:
                ema_adapters = tck.host_fetch(state.ema.params)
                kw["ema_override"] = lora_lib.merge_lora(
                    base_host, ema_adapters, scale)
                kw["extra_aux"]["lora_ema"] = ema_adapters
        return tck.save_checkpoint(
            args.output_dir, step, state, bundle.unet_cfg,
            args.checkpoints_total_limit, background=background, **kw)

    batch_sh = mesh_lib.batch_sharding(m)
    key = jax.random.PRNGKey(args.seed or 0)

    os.makedirs(args.output_dir, exist_ok=True)
    preempt, restore_signals = _install_preemption_handler()
    t0 = time.time()
    last_logged_step, last_logged_t = global_step, t0
    losses = []
    profiling_active = False
    preempted = False
    # a resumed step already has its checkpoint on disk — but only count it
    # as "saved" when it lives in THIS output_dir (resuming from a foreign
    # checkpoint with no further steps must still write one here);
    # -1 = nothing saved
    last_saved_step = (global_step
                       if global_step and resumed_in_output_dir else -1)
    while global_step < args.max_train_steps:
        if is_main and args.profile_step and global_step + 1 == args.profile_step:
            # steps [profile_step, profile_step + profile_num_steps) land in
            # the trace (works through the axon tunnel — the device plane
            # captures per-op times, tools/tpu_profile_episode.py)
            jax.profiler.start_trace(os.path.join(args.output_dir, "profile"))
            profiling_active = True
        micro = []
        for j in range(args.gradient_accumulation_steps):
            mi = global_step * args.gradient_accumulation_steps + j
            shot_rng = random.Random(_mix(base_seed, proc_idx, mi, 1))
            micro.append(
                _episode_to_streams(next(next(robin)), shot_rng, args.nshot)
            )
        batch = {
            "query": np.stack([mb[0] for mb in micro]),
            "q_mask3": np.stack([mb[1] for mb in micro]),
            "supports": np.stack([mb[2] for mb in micro]),
            "s_mask3": np.stack([mb[3] for mb in micro]),
            "shot_mask": np.stack([mb[4] for mb in micro]),
        }
        from jax.sharding import PartitionSpec as P

        batch = mesh_lib.put_global_batch(batch, m, P(None, "data"))
        # counter-keyed (not a sequential split chain): resume-invariant
        sub = jax.random.fold_in(key, global_step)
        if args.lora_rank > 0:
            state, metrics = step_fn(state, batch, sub, base_c, vae_p, text_e)
        else:
            state, metrics = step_fn(state, batch, sub, vae_p, text_e)
        global_step += 1

        if profiling_active and \
                global_step >= args.profile_step + args.profile_num_steps - 1:
            float(metrics["loss"])  # honest sync: host read, not
            #                         block_until_ready (CLAUDE.md tunnel note)
            jax.profiler.stop_trace()
            profiling_active = False
            print(f"profiler trace through step {global_step} written to "
                  f"{args.output_dir}/profile")

        if (global_step % args.logging_steps == 0 or global_step == 1) and is_main:
            loss = float(metrics["loss"])
            losses.append(loss)
            now = time.time()
            rate = global_step / (now - t0)
            # windowed rate: steps since the previous log over wall since it
            # (the cumulative rate hides checkpoint-write and resume stalls)
            win_rate = ((global_step - last_logged_step) / (now - last_logged_t)
                        if now > last_logged_t else rate)
            last_logged_step, last_logged_t = global_step, now
            print(f"step {global_step}/{args.max_train_steps} "
                  f"loss {loss:.5f} ({rate:.2f} opt-steps/s)")
            log_scalar("train_loss", loss, global_step)
            if args.metrics_jsonl:
                with open(args.metrics_jsonl, "a") as fh:
                    fh.write(json.dumps({
                        "step": global_step, "loss": round(loss, 6),
                        "steps_per_s": round(win_rate, 4),
                        "wall_s": round(now - t0, 2),
                        "total_notfinite":
                            int(metrics.get("total_notfinite", 0)),
                    }) + "\n")
            nf = int(metrics.get("total_notfinite", 0))
            if nf:
                # containment (optax.apply_if_finite) is silent by design;
                # make the skipped steps visible so a diverging run is
                # diagnosed from the log, not discovered at eval time
                print(f"  [containment] {nf} nonfinite step(s) skipped so "
                      f"far ({int(metrics['notfinite_count'])} consecutive)")
                log_scalar("nonfinite_steps", nf, global_step)

        if args.validation_steps and global_step % args.validation_steps == 0:
            # The param snapshot is a COLLECTIVE under multi-host FSDP
            # (host_fetch all-gathers cross-process shards), so every
            # process must take it; only process 0 then runs the eval
            # loop on its local (host-replicated) copy.  Single-process
            # keeps the zero-copy device tree.
            vparams = (tck.host_fetch(merged_unet_params(state))
                       if proc_cnt > 1 else merged_unet_params(state))
            if is_main:
                run_validation(vparams, global_step)

        if global_step % args.checkpointing_steps == 0:
            # background write: the multi-GB serialization overlaps the
            # next training steps (snapshot is taken synchronously).  Every
            # process participates (the snapshot is a collective under
            # multi-host FSDP); only process 0 writes.
            handle = save_ckpt(global_step, background=True, write=is_main)
            last_saved_step = global_step
            if is_main:
                print(f"saving {handle.ckpt_dir} (background)")

        stop = preempt.is_set()
        if proc_cnt > 1:
            # signal delivery can straddle a step boundary between
            # processes; agree on the exit step COLLECTIVELY, or one
            # process would enter the final-save snapshot's all-gathers
            # while another runs the next train step — mismatched
            # collective programs deadlock the pod
            from jax.experimental import multihost_utils

            stop = bool(
                multihost_utils.process_allgather(np.asarray([stop])).any())
        if stop:
            preempted = True
            break

    restore_signals()
    if profiling_active:  # loop ended inside the profiled window
        jax.profiler.stop_trace()
    tck.wait_for_pending_saves()  # non-primary processes have none queued
    if global_step != last_saved_step:
        # skip the final save when the in-loop cadence already wrote this
        # exact step (max_train_steps % checkpointing_steps == 0) — the
        # multi-GB re-serialization would be pure waste; the same path
        # writes the preemption checkpoint (loop exited early).  A shared
        # step counter (not os.path.isdir) keeps the decision identical on
        # every process, so the collective snapshot can't desync.
        save_ckpt(global_step, background=False, write=is_main)
    if writer:
        writer.close()
    if preempted:
        print(f"training preempted at step {global_step}/{args.max_train_steps}"
              f" — checkpoint-{global_step} written; resume with "
              "--resume_from_checkpoint latest", flush=True)
        return
    print("training done")


if __name__ == "__main__":
    main()
