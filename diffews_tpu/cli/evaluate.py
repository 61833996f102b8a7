"""Evaluation harness CLI.

TPU-native counterpart of `evaluation_util/main_oss.py`: same flags, same
seeded episodic protocol, same metric math — the episode loop drives the
single-XLA-program pipeline instead of the torch double-dispatch one.

Usage (mirrors `scripts/eval_coco2014_rthres_1shot_nosample.sh`):

    python -m diffews_tpu.cli.evaluate \\
        --checkpoint weight/stable-diffusion-2-1-ref8inchannels-tag4inchannels \\
        --unet_ckpt_path $MODEL_DIR/unet \\
        --scheduler_load_path ./scheduler_1.0_1.0 \\
        --datapath FSSBench --benchmark coco --fold 0 --nshot 1 \\
        --img-size 512 --denoise_steps 1 --ensemble_size 1 \\
        --threshold 0 --r_threshold 0.25 --log-root ./logs/eval
"""

from __future__ import annotations

import argparse
import os
import random
import time

import numpy as np

from diffews_tpu.data.dataset import FSSDataset
from diffews_tpu.evaluation import AverageMeter, Evaluator
from diffews_tpu.evaluation.meter import EvalLogger
from diffews_tpu.evaluation.vis import Visualizer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("DiffewS-TPU one-shot segmentation evaluation")
    # dataset
    p.add_argument("--datapath", type=str, default="datasets")
    p.add_argument("--benchmark", type=str, default="coco",
                   choices=["fss", "coco", "pascal", "lvis", "paco_part",
                            "pascal_part", "pascal_cd"])
    p.add_argument("--bsz", type=int, default=1)
    p.add_argument("--nworker", type=int, default=0)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1)
    p.add_argument("--img-size", dest="img_size", type=int, default=518)
    p.add_argument("--use_original_imgsize", action="store_true")
    p.add_argument("--log-root", dest="log_root", type=str, default="output/debug")
    p.add_argument("--visualize", type=int, default=0)
    p.add_argument("--vis_path", type=str, default="output/debug/vis")
    # diffusion
    p.add_argument("--checkpoint", type=str, required=True,
                   help="diffusers-layout base checkpoint directory")
    p.add_argument("--scheduler_load_path", type=str, default=None)
    p.add_argument("--unet_ckpt_path", type=str, default=None)
    p.add_argument("--denoise_steps", type=int, default=1)
    p.add_argument("--threshold", type=float, default=0.1)
    p.add_argument("--r_threshold", type=float, default=0.0)
    p.add_argument("--half_precision", action="store_true",
                   help="bfloat16 compute (TPU-native half precision)")
    p.add_argument("--ensemble_size", type=int, default=1)
    p.add_argument("--test_timestep", type=int, default=1)
    p.add_argument("--attn_impl", type=str, default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--attn_mask_variant", action="store_true",
                   help="evaluate with the experimental attn-mask "
                        "conditioning (support masks as attention key "
                        "biases, `unet_2d_condition_attn.py`); the "
                        "checkpoint must have been trained with "
                        "`cli/train.py --attn_mask_variant`")
    p.add_argument("--max_episodes", type=int, default=0,
                   help="cap episode count (0 = full protocol)")
    p.add_argument("--dispatch_ahead", type=int, default=2,
                   help="episodes kept in flight on the device; host metric "
                        "work overlaps device compute (1 = synchronous)")
    p.add_argument("--mask_on_device", action="store_true",
                   help="compute the threshold rule in-graph and transfer "
                        "only the packed bool mask (~24x fewer d2h bytes "
                        "per episode; pipeline.device_mask_from_seg). "
                        "OPT-IN: pinned ulp-exact against the host formula "
                        "on CPU, but a TPU ulp-tie divergence is possible "
                        "in principle, so the default protocol keeps host "
                        "thresholding")
    p.add_argument("--num_shot_shards", type=int, default=1,
                   help="shard each episode's SUPPORT SHOTS over this many "
                        "chips (a jax.sharding 'shots' mesh; must divide "
                        "--nshot): shot-parallel serving for episodes "
                        "whose nshot*hw KV outgrows one chip. Composes "
                        "with --num_data_shards (a 2-D data x shots mesh "
                        "over num_data_shards*num_shot_shards chips).")
    p.add_argument("--num_data_shards", type=int, default=1,
                   help="shard the episode batch over this many chips "
                        "(a jax.sharding 'data' mesh; bsz must divide it). "
                        "The reference evaluates on one GPU.")
    p.add_argument("--encode_chunks", type=int, default=0,
                   help="run the batched VAE encode as a lax.map over N "
                        "chunks: same numerics, ~N-fold smaller encode HLO "
                        "(huge episode graphs, e.g. 5-shot at large --bsz, "
                        "fail or are slow to compile). 0 = auto: chunk only "
                        "past 48 encoded images")
    p.add_argument("--vae_impl", type=str, default="xla",
                   choices=["xla", "fused", "mixed", "auto", "int8"],
                   help="VAE resnet implementation. Default 'xla' keeps "
                        "metrics independent of --bsz; 'auto' opts into the "
                        "small-batch fused Pallas path (faster at bsz<=1 on "
                        "TPU, batch-dependent rounding); 'int8' quantizes "
                        "the VAE 3x3 convs W8A8 for the MXU int8 rate "
                        "(fastest, accuracy-affecting opt-in)")
    p.add_argument("--unet_int8", action="store_true",
                   help="also quantize the UNet's self-attention/FFN "
                        "linears W8A8 (ops/quant.py::unet_attention_linear;"
                        " accuracy-affecting opt-in)")
    return p


def evaluate(args, pipe=None, raw_images: bool = True) -> tuple[float, float]:
    """Run the seeded eval protocol.  `pipe` injects a prebuilt
    `DiffewsPipeline` (benchmark tools use random-init full-size models
    without materializing a checkpoint on disk); default builds one from
    `args.checkpoint` like the reference harness (`main_oss.py:338-372`).
    `raw_images=False` falls back to host-normalized float episodes
    (numerically identical; ~8x more h2d bytes — A/B hook for tools)."""
    # Seeded protocol (main_oss.py:33-36): global RNGs pinned before episode
    # sampling.
    random.seed(0)
    np.random.seed(0)

    EvalLogger.initialize(args, root=args.log_root, benchmark=args.benchmark)
    Visualizer.initialize(bool(args.visualize), args.vis_path)

    import jax.numpy as jnp

    from diffews_tpu.pipeline import DiffewsPipeline

    mesh = None
    if args.num_data_shards > 1:
        from diffews_tpu.parallel import mesh as mesh_lib

        if args.bsz % args.num_data_shards:
            raise SystemExit(f"--bsz {args.bsz} must be divisible by "
                             f"--num_data_shards {args.num_data_shards}")
        mesh = mesh_lib.make_mesh(n_data=args.num_data_shards)
    shot_mesh = None
    if args.num_shot_shards > 1:
        from diffews_tpu.parallel import mesh as mesh_lib

        if args.nshot % args.num_shot_shards:
            raise SystemExit(f"--nshot {args.nshot} must be divisible by "
                             f"--num_shot_shards {args.num_shot_shards}")
        # composing with --num_data_shards builds a 2-D ("data", "shots")
        # mesh: batch rows over "data", each group's shots over "shots"
        if args.num_data_shards > 1 and args.bsz % args.num_data_shards:
            raise SystemExit(f"--bsz {args.bsz} must be divisible by "
                             f"--num_data_shards {args.num_data_shards}")
        shot_mesh = mesh_lib.make_shot_mesh(args.num_shot_shards,
                                            n_data=args.num_data_shards)
        mesh = None  # the 2-D shot mesh subsumes the plain data mesh

    if pipe is None:
        pipe = DiffewsPipeline.from_pretrained(
            args.checkpoint,
            unet_dir=args.unet_ckpt_path,
            scheduler_dir=args.scheduler_load_path,
            compute_dtype=jnp.bfloat16 if args.half_precision else jnp.float32,
            attn_impl=args.attn_impl,
            test_timestep=args.test_timestep,
            mesh=mesh,
            shot_mesh=shot_mesh,
            encode_chunks=args.encode_chunks,
            vae_impl=args.vae_impl,
            unet_int8=args.unet_int8,
            attn_mask_variant=args.attn_mask_variant,
        )

    # raw_images: episodes stay uint8 HWC on the host; the pipeline
    # normalizes in-graph (identical arithmetic, ~8x smaller h2d upload)
    FSSDataset.initialize(args.img_size, args.datapath, args.use_original_imgsize,
                          raw_images=raw_images)
    loader = FSSDataset.build_dataloader(
        args.benchmark, args.bsz, args.nworker, args.fold, "test", args.nshot
    )
    meter = AverageMeter(loader.dataset.benchmark, loader.dataset.class_ids)

    n_total = len(loader)
    t0 = time.time()
    n_done = 0
    depth = max(1, args.dispatch_ahead)
    in_flight: list = []  # [(idx, batch, PendingSeg)]

    def drain_one():
        nonlocal n_done
        idx, batch, pending = in_flight.pop(0)
        # need_seg=False: scoring and visualization only use the mask; the
        # host-threshold path still transfers the seg (it computes the mask
        # from it), the --mask_on_device path skips that transfer entirely
        pred = pending.result(need_seg=False).mask.astype(np.int64)
        inter, union = Evaluator.classify_prediction(
            pred, batch["query_mask"], batch.get("query_ignore_idx")
        )
        meter.update(inter, union, batch["class_id"])
        meter.write_process(idx, n_total, epoch=-1, write_batch_idx=50)
        n_done += pred.shape[0]
        if Visualizer.visualize:
            iou = inter[1] / np.maximum(union[1], 1)
            Visualizer.visualize_prediction_batch(
                batch["support_imgs"], batch["support_masks"], batch["query_img"],
                batch["query_mask"], pred, batch["class_id"], idx, iou,
            )

    for idx, batch in enumerate(loader):
        if args.max_episodes and idx >= args.max_episodes:
            break
        # support masks stay (B,N,H,W) {0,1} uint8; the 3-channel [-1,1]
        # folding (main_oss.py:100-104) happens in-graph on device.
        if raw_images:
            smask = batch["support_masks"].astype(np.uint8)
        else:
            smask = (np.repeat(batch["support_masks"][:, :, None], 3, axis=2)
                     * 2.0 - 1.0)

        # Dispatch ahead: the device computes episode i while the host scores
        # episode i-1 (JAX async dispatch; numerics unchanged).
        in_flight.append((idx, batch, pipe.predict_async(
            batch["query_img"],
            batch["support_imgs"],
            smask,
            denoising_steps=args.denoise_steps,
            # prediction is compared against query_mask: same-size resize is a
            # no-op in the standard protocol; with --use_original_imgsize the
            # gt keeps its native size and the prediction must match it
            out_size=tuple(np.asarray(batch["query_mask"]).shape[-2:]),
            r_threshold=args.r_threshold,
            threshold=args.threshold if args.r_threshold <= 0 else 0.0,
            mask_on_device=args.mask_on_device,
        )))
        if len(in_flight) >= depth:
            drain_one()
    while in_flight:
        drain_one()

    dt = time.time() - t0
    miou, fb_iou = meter.write_result("Test", 0)
    EvalLogger.info(f"throughput: {n_done / dt:.3f} episodes/s ({n_done} in {dt:.1f}s)")
    EvalLogger.info("mIoU: %5.2f \t FB-IoU: %5.2f" % (miou, fb_iou))
    return miou, fb_iou


def main(argv=None):
    args = build_parser().parse_args(argv)
    if os.environ.get("DIFFEWS_PLATFORM"):
        # Subprocess escape hatch (same pattern as bench.py's
        # BENCH_PLATFORM): this machine's sitecustomize pins
        # JAX_PLATFORMS=axon and env vars cannot override it, but an
        # in-process config update can — used by CI subprocess runs
        # (e.g. tests/test_measure_baseline.py's dry run).
        import jax

        jax.config.update("jax_platforms", os.environ["DIFFEWS_PLATFORM"])
    return evaluate(args)


if __name__ == "__main__":
    main()
