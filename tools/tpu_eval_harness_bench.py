"""Harness-level eval throughput on the real TPU chip.

Unlike bench.py (device-resident inputs, pure compute), this drives the
ACTUAL eval CLI loop — seeded synthetic-COCO episode sampling, PIL 512px
resizes, uint8 h2d upload, in-graph normalization, depth-2 pipelined
dispatch, thresholding, histc IoU scoring — with a random-init full-size
SD-2.1 model, i.e. everything the reference's `main_oss.py` does per
episode (`evaluation_util/main_oss.py:84-171`) minus real data on disk.

Usage: python tools/tpu_eval_harness_bench.py [--bsz 8] [--episodes 96]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bsz", type=int, default=8)
    ap.add_argument("--episodes", type=int, default=96)
    ap.add_argument("--nshot", type=int, default=1)
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--dispatch_ahead", type=int, default=2)
    ap.add_argument("--float_ingest", action="store_true",
                    help="A/B: host-normalized f32 episodes (~8x more h2d)")
    ap.add_argument("--nworker", type=str, default="0",
                    help=">0 enables the threaded single-producer prefetch "
                         "+ parallel episode finalize (identical episode "
                         "RNG order; overlaps PIL with device compute). "
                         "Comma-separated list = in-process A/B sweep "
                         "(one compile, N measurements)")
    ap.add_argument("--mask_modes", type=str, default="host",
                    help="comma list of host|device: in-process A/B of "
                         "--mask_on_device (in-graph threshold, packed-"
                         "bool d2h instead of the full seg image)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import helpers.synthetic_data as syn
    from diffews_tpu import checkpoint as C
    from diffews_tpu.cli import evaluate as E
    from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                     UNetConfig, VAEConfig)
    from diffews_tpu.models import unet, vae
    from diffews_tpu.pipeline import DiffewsPipeline

    ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)), ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)), vcfg,
        None, CLIPTextConfig.sd21(), SchedulerConfig.diffews(),
    )
    pipe = DiffewsPipeline(bundle, compute_dtype=jnp.bfloat16)

    # Pre-warm the compile with the exact eval shapes so the harness loop
    # below measures steady state, not the 1-4 min remote compile.
    import numpy as np

    b, n, s = args.bsz, args.nshot, args.img_size
    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.float_ingest:
        pipe.predict(
            rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32),
            rng.uniform(-1, 1, (b, n, s, s, 3)).astype(np.float32),
            np.where(rng.random((b, n, s, s, 3)) > 0.5, 1.0, -1.0).astype(np.float32),
            r_threshold=0.25, out_size=(s, s),
        )
    else:
        pipe.predict(
            rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8),
            rng.integers(0, 256, (b, n, s, s, 3), dtype=np.uint8),
            rng.integers(0, 2, (b, n, s, s), dtype=np.uint8),
            r_threshold=0.25, out_size=(s, s),
        )
    print(f"[harness] compile+warm: {time.time() - t0:.1f}s", flush=True)

    with tempfile.TemporaryDirectory() as root:
        data = os.path.join(root, "data")
        syn.make_coco(data, imgs_per_class=3)
        n_batches = max(1, args.episodes // args.bsz)
        for nworker in args.nworker.split(","):
            for mm in args.mask_modes.split(","):
                eargs = E.build_parser().parse_args([
                    "--checkpoint", "/nonexistent-injected",
                    "--datapath", data, "--benchmark", "coco", "--fold", "0",
                    "--nshot", str(args.nshot),
                    "--img-size", str(args.img_size),
                    "--bsz", str(args.bsz), "--r_threshold", "0.25",
                    "--nworker", nworker,
                    "--half_precision", "--denoise_steps", "1",
                    "--log-root", os.path.join(root, "logs"),
                    "--dispatch_ahead", str(args.dispatch_ahead),
                    "--max_episodes", str(n_batches),
                ] + (["--mask_on_device"] if mm == "device" else []))
                t0 = time.time()
                E.evaluate(eargs, pipe=pipe, raw_images=not args.float_ingest)
                total = time.time() - t0
                print(f"[harness] nworker={nworker} mask={mm}: {total:.1f}s "
                      f"({n_batches * args.bsz} episodes, "
                      f"{n_batches * args.bsz / total:.2f} ep/s)", flush=True)


if __name__ == "__main__":
    main()
