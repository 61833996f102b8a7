"""Sustained SD-2.1 512px training through the REAL train CLI (VERDICT r2 #5).

Round 2 validated 50-60 steps; this driver runs the canonical footprint
shape (`/root/reference/scripts/train_cocofold0_4090_nocrop_lr1_nearest_
fold1_7shot_ori_v3.sh:3-12`: bs1, 512px, polynomial LR — steps scaled to the
session budget) for hundreds of steps with a mid-run SIGTERM, then resumes
from the preemption checkpoint to the target step.  The committed artifact
is `artifacts/train_sustained.jsonl` (--metrics_jsonl series: loss +
windowed steps/s across both legs) + its PNG (tools/plot_train_metrics.py).

Stages (run separately so a relay hiccup doesn't redo host-side prep):
  --prep              write the random-init SD-2.1 diffusers checkpoint
                      (host CPU jax) + synthetic COCO sources to --root
  --run               leg 1: train to --steps, SIGTERM at ~--sigterm_after
                      (driver sends it; CLI checkpoints + exits 0)
  --resume            leg 2: --resume_from_checkpoint latest to --steps
  (each leg appends to the same metrics JSONL)

Usage: python tools/tpu_train_sustained.py --prep [--root /tmp/sustained]
       python tools/tpu_train_sustained.py --run  [--steps 500]
           [--sigterm_after 280] [--jsonl artifacts/train_sustained.jsonl]
       python tools/tpu_train_sustained.py --resume [--steps 500] ...
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _arg(flag, default, cast=int):
    return (cast(sys.argv[sys.argv.index(flag) + 1])
            if flag in sys.argv else default)


def prep(root):
    # host-only: pin CPU before jax initializes so the chip is untouched
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diffews_tpu import checkpoint as C
    from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                     UNetConfig, VAEConfig)
    from diffews_tpu.models import clip_text, unet, vae

    ck = os.path.join(root, "ckpt")
    ucfg, vcfg, tcfg = UNetConfig.sd21(), VAEConfig.sd(), CLIPTextConfig.sd21()
    t0 = time.time()
    C.save_unet(jax.jit(lambda r: unet.init_params(r, ucfg))(
        jax.random.PRNGKey(0)), ucfg, os.path.join(ck, "unet"))
    print(f"unet written ({time.time() - t0:.0f}s)", flush=True)
    C.save_vae(jax.jit(lambda r: vae.init_params(r, vcfg))(
        jax.random.PRNGKey(1)), vcfg, os.path.join(ck, "vae"))
    tp = clip_text.init_params(jax.random.PRNGKey(2), tcfg)
    state = {"text_model." + k: v
             for k, v in C.pytree_to_torch_state(tp).items()}
    C.save_torch_weights(state, os.path.join(ck, "text_encoder"),
                         C.TEXT_SAFETENSORS)
    with open(os.path.join(ck, "text_encoder", "config.json"), "w") as f:
        json.dump({"vocab_size": tcfg.vocab_size,
                   "hidden_size": tcfg.hidden_size,
                   "intermediate_size": tcfg.intermediate_size,
                   "num_hidden_layers": tcfg.num_hidden_layers,
                   "num_attention_heads": tcfg.num_attention_heads}, f)
    os.makedirs(os.path.join(ck, "scheduler"), exist_ok=True)
    with open(os.path.join(ck, "scheduler", "scheduler_config.json"),
              "w") as f:
        json.dump(SchedulerConfig.diffews().to_diffusers_dict(), f)

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from helpers import synthetic_data as syn

    # 80 classes: fold-0 TRAIN samples from all 60 train classes
    # small sources (fixture default 40x30): the run measures sustained
    # device training + checkpoint/resume, not loader host cost (that is
    # tools/loader_bench.py's job)
    syn.make_coco(os.path.join(root, "data"), n_classes=80, imgs_per_class=4)
    print(f"prep done in {time.time() - t0:.0f}s -> {root}", flush=True)


def run_leg(root, steps, jsonl, resume, sigterm_after):
    out = os.path.join(root, "run")
    cmd = [
        sys.executable, "-m", "diffews_tpu.cli.train",
        "--pretrained_model_name_or_path", os.path.join(root, "ckpt"),
        "--datapath", os.path.join(root, "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "1",
        "--resolution", "512", "--train_batch_size", "1",
        "--gradient_accumulation_steps", "1",
        "--learning_rate", "1e-5", "--lr_scheduler", "polynomial",
        "--max_train_steps", str(steps),
        "--checkpointing_steps", "250", "--checkpoints_total_limit", "2",
        "--logging_steps", "10", "--seed", "0",
        "--metrics_jsonl", jsonl,
        "--output_dir", out,
    ]
    if resume:
        cmd += ["--resume_from_checkpoint", "latest"]
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO)
    if sigterm_after and not resume:
        # poll the metrics JSONL for step progress; SIGTERM once past the
        # threshold — exercises preemption -> checkpoint -> clean exit
        sent = False
        while proc.poll() is None:
            time.sleep(5)
            try:
                with open(jsonl) as fh:
                    last = [json.loads(l) for l in fh if l.strip()][-1]
            except (OSError, IndexError):
                continue
            if not sent and last["step"] >= sigterm_after:
                print(f"driver: step {last['step']} >= {sigterm_after}, "
                      "sending SIGTERM", flush=True)
                proc.send_signal(signal.SIGTERM)
                sent = True
    rc = proc.wait()
    print(f"leg exited rc={rc}", flush=True)
    return rc


def main():
    root = (sys.argv[sys.argv.index("--root") + 1]
            if "--root" in sys.argv else "/tmp/sustained")
    steps = _arg("--steps", 500)
    jsonl = (sys.argv[sys.argv.index("--jsonl") + 1] if "--jsonl" in sys.argv
             else os.path.join(REPO, "artifacts", "train_sustained.jsonl"))
    os.makedirs(os.path.dirname(jsonl), exist_ok=True)
    if "--prep" in sys.argv:
        prep(root)
    elif "--run" in sys.argv:
        sys.exit(run_leg(root, steps, jsonl, False,
                         _arg("--sigterm_after", 280)))
    elif "--resume" in sys.argv:
        sys.exit(run_leg(root, steps, jsonl, True, 0))
    else:
        raise SystemExit("need one of --prep / --run / --resume")


if __name__ == "__main__":
    main()
