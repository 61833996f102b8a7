"""W8A8-vs-bf16 eval-decision flip rate over synthetic episodes (on-chip).

VERDICT r2 #2: the 8.19x throughput configuration (cached supports + int8 +
b16) changes eval numerics vs the bf16 headline, and that effect was
unquantified.  This tool measures it at the DECISION level: the binary mask
the eval protocol actually scores (uint8 image -> /255 -> relative
threshold `mean_RGB > r * max`, `evaluation_util/main_oss.py:131-137`
semantics via `pipeline.PendingSeg.result`).

Modes (each vs the bf16 full-episode base on IDENTICAL inputs):
  lsb    — bf16 with every query pixel +1 uint8 step: the protocol's
           INTRINSIC sensitivity floor (the uint8 round-trip quantizes to
           1/255 grid; decisions this perturbation flips were never
           numerically meaningful).
  int8   — W8A8 VAE, calibrated static scales (`--vae_impl int8`).
  int8u  — + int8 UNet attn1/FFN linears (`--unet_int8`).
  cached — predict_cached with int8u numerics at the SAME per-episode
           supports: the literal 8.19x serving configuration end to end
           (support-KV cache + quantization together).

Reported per mode: pixel flip rate vs base, per-episode flip p50/p99/max,
mean IoU of the mode's mask against the base mask, episodes with >1%
flipped pixels.  The verdict logic: int8 flip rates at or below the `lsb`
intrinsic floor mean quantization does not move decisions beyond the
protocol's own quantization noise.

Usage: python tools/tpu_int8_flip_rate.py [--episodes 104] [--bsz 8]
           [--size 512] [--modes lsb,int8,int8u,cached] [--tiny]
           [--workdir /tmp/flip_rate_masks]
           [--checkpoint DIR] [--unet_ckpt DIR] [--task_episodes]
Each mode runs in its OWN subprocess (sequential — one TPU client at a
time) and persists its masks to --workdir, so reruns reuse completed
modes and a crashed mode costs only itself.
Results recorded in PERF.md ("int8 accuracy dossier").

--checkpoint/--unet_ckpt load real weights (diffusers layout; unet_ckpt
overrides the unet subdir, like the eval CLI) instead of random init —
used with the round-4 capability-trained tiny weights to bound the
dossier's random-init caveat: random init concentrates probability mass
near the decision threshold, so its flip rates should OVERESTIMATE the
trained-weight effect.  --task_episodes swaps the smooth-noise episodes
for correlated task-style ones (bright object on dim noise, the
capability task's distribution) so trained weights are measured
in-distribution.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu import checkpoint as ckpt_lib
from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig, UNetConfig,
                                 VAEConfig)
from diffews_tpu.models import unet, vae
from diffews_tpu.pipeline import DiffewsPipeline

R_THRESHOLD = 0.25  # the reference protocol's relative threshold


def _arg(flag, default, cast=int):
    return (cast(sys.argv[sys.argv.index(flag) + 1])
            if flag in sys.argv else default)


def _smooth_images(rng, n, s):
    """Low-frequency uint8 images (16x16 noise upsampled): give the VAE/UNet
    natural-image-like spectra so activation ranges resemble calibration."""
    base = rng.uniform(0, 255, (n, 16, 16, 3)).astype(np.float32)
    up = jax.image.resize(jnp.asarray(base), (n, s, s, 3), "linear")
    return np.asarray(jnp.clip(up, 0, 255)).astype(np.uint8)


def _episodes(rng, n_ep, s):
    q = _smooth_images(rng, n_ep, s)
    sup = _smooth_images(rng, n_ep, s)[:, None]  # nshot=1
    m = np.asarray(
        jax.image.resize(
            jnp.asarray(rng.uniform(-1, 1, (n_ep, 8, 8)).astype(np.float32)),
            (n_ep, s, s), "linear")) > 0.0
    return q, sup, m[:, None].astype(np.uint8)


def _task_episodes(rng, n_ep, s):
    """Correlated task-style episodes (the capability task's distribution:
    dim noise background, bright noisy rectangle = the mask) so TRAINED
    weights are measured in-distribution rather than on pure noise."""
    def img_and_mask(n):
        imgs = rng.integers(0, 90, (n, s, s, 3)).astype(np.uint8)
        fg = rng.integers(170, 255, (n, s, s, 3)).astype(np.uint8)
        masks = np.zeros((n, s, s), np.uint8)
        for i in range(n):
            r0, c0 = rng.integers(0, s // 2, 2)
            r1 = rng.integers(r0 + s // 4, s + 1)
            c1 = rng.integers(c0 + s // 4, s + 1)
            masks[i, r0:r1, c0:c1] = 1
            imgs[i][masks[i] > 0] = fg[i][masks[i] > 0]
        return imgs, masks

    q, qm = img_and_mask(n_ep)
    del qm  # the flip-rate compares mode masks to each other, not to gt
    sup, sm = img_and_mask(n_ep)
    return q, sup[:, None], sm[:, None]


def _run_mode(pipe, q, sup, msk, bsz, *, perturb=0, cached=False):
    """Masks for all episodes, depth-2 pipelined dispatch (eval-harness
    pattern); returns (masks bool (E,s,s), wall seconds)."""
    n_ep = q.shape[0]
    t0 = time.time()
    pending, masks = [], []
    for i in range(0, n_ep, bsz):
        qb = q[i:i + bsz]
        if perturb:
            qb = np.minimum(qb.astype(np.int32) + perturb, 255).astype(
                np.uint8)
        if cached:
            cache = pipe.precompute_supports(sup[i:i + bsz], msk[i:i + bsz])
            pending.append(pipe.predict_cached_async(
                qb, cache, r_threshold=R_THRESHOLD))
        else:
            pending.append(pipe.predict_async(
                qb, sup[i:i + bsz], msk[i:i + bsz],
                r_threshold=R_THRESHOLD))
        if len(pending) >= 2:
            masks.append(pending.pop(0).result().mask)
    while pending:
        masks.append(pending.pop(0).result().mask)
    return np.concatenate(masks, axis=0), time.time() - t0


def _compare(name, got, base):
    flips = (got != base).reshape(base.shape[0], -1)
    per_ep = flips.mean(axis=1)
    inter = (got & base).reshape(base.shape[0], -1).sum(axis=1)
    union = (got | base).reshape(base.shape[0], -1).sum(axis=1)
    iou = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    rec = {
        "mode": name,
        "pixel_flip_rate": round(float(per_ep.mean()), 6),
        "ep_flip_p50": round(float(np.percentile(per_ep, 50)), 6),
        "ep_flip_p99": round(float(np.percentile(per_ep, 99)), 6),
        "ep_flip_max": round(float(per_ep.max()), 6),
        "mean_iou_vs_base": round(float(iou.mean()), 5),
        "episodes_gt_1pct": int((per_ep > 0.01).sum()),
        "episodes": int(base.shape[0]),
    }
    print(json.dumps(rec), flush=True)
    return rec


PIPE_KW = {
    "base": {},
    "lsb": {},      # bf16 pipeline, +1-LSB-perturbed queries
    "int8": {"vae_impl": "int8"},
    "int8u": {"vae_impl": "int8", "unet_int8": True},
    "cached": {"vae_impl": "int8", "unet_int8": True},
}


def _worker(mode, n_ep, bsz, s, tiny, out_npz, checkpoint=None,
            unet_ckpt=None, task=False):
    """One mode end to end in THIS process; masks -> out_npz.

    Subprocess-per-mode is a hard requirement, not hygiene: the in-process
    loop leaked ~30 GB of host RSS per pipeline build (jit cache constants
    + bundle copies) and the 4-mode run was OOM-killed at 130 GB by the
    driver host.  Process exit is the only reliable reclaim."""
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        ucfg, vcfg, tcfg = (UNetConfig.tiny(), VAEConfig.tiny(),
                            CLIPTextConfig.tiny())
    else:
        ucfg, vcfg, tcfg = (UNetConfig.sd21(), VAEConfig.sd(),
                            CLIPTextConfig.sd21())
    if checkpoint:
        up, ucfg = ckpt_lib.load_unet(
            unet_ckpt or os.path.join(checkpoint, "unet"))
        vp, vcfg = ckpt_lib.load_vae(os.path.join(checkpoint, "vae"))
    else:
        up = jax.device_get(jax.jit(
            lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)))
        vp = jax.device_get(jax.jit(
            lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)))
    bundle = ckpt_lib.PipelineBundle(up, ucfg, vp, vcfg, None, tcfg,
                                     SchedulerConfig.diffews())
    # identical episode tensors in every worker: fresh seeded rng
    gen = _task_episodes if task else _episodes
    q, sup, msk = gen(np.random.default_rng(0), n_ep, s)
    pipe = DiffewsPipeline(bundle, compute_dtype=jnp.bfloat16,
                           attn_impl="auto", **PIPE_KW[mode])
    got, dt = _run_mode(pipe, q, sup, msk, bsz,
                        perturb=1 if mode == "lsb" else 0,
                        cached=(mode == "cached"))
    np.savez_compressed(out_npz + ".tmp.npz", masks=got, wall=dt)
    os.replace(out_npz + ".tmp.npz", out_npz)  # crash-safe: no partial npz
    print(f"[{mode}] {n_ep / dt:.2f} ep/s incl compile -> {out_npz}",
          flush=True)


def main():
    n_ep = _arg("--episodes", 104)
    bsz = _arg("--bsz", 8)
    s = _arg("--size", 512)
    modes = (sys.argv[sys.argv.index("--modes") + 1].split(",")
             if "--modes" in sys.argv else ["lsb", "int8", "int8u", "cached"])
    tiny = "--tiny" in sys.argv
    if tiny:
        s = min(s, 32)
    workdir = (sys.argv[sys.argv.index("--workdir") + 1]
               if "--workdir" in sys.argv else "/tmp/flip_rate_masks")
    checkpoint = _arg("--checkpoint", None, str)
    unet_ckpt = _arg("--unet_ckpt", None, str)
    task = "--task_episodes" in sys.argv

    if "--worker" in sys.argv:  # child: one mode, then exit
        _worker(sys.argv[sys.argv.index("--worker") + 1], n_ep, bsz, s,
                tiny, sys.argv[sys.argv.index("--out") + 1],
                checkpoint=checkpoint, unet_ckpt=unet_ckpt, task=task)
        return

    # Orchestrator: NO jax device use here (children need the chip claim).
    # Existing npz files are reused, so a crashed/OOM-killed mode only
    # costs its own rerun.
    import subprocess

    os.makedirs(workdir, exist_ok=True)
    print(f"flip-rate run: {n_ep} episodes, {s}px, b{bsz}, "
          f"modes={modes}", flush=True)

    def mode_npz(mode):
        sfx = ("_t" if tiny else "") + ("_ck" if checkpoint else "") + \
              ("_task" if task else "")
        return os.path.join(workdir, f"{mode}_{n_ep}x{s}_b{bsz}{sfx}.npz")

    for mode in ["base"] + [m for m in modes if m != "base"]:
        out = mode_npz(mode)
        if os.path.exists(out):
            print(f"[{mode}] reusing {out}", flush=True)
            continue
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", mode,
               "--out", out, "--episodes", str(n_ep), "--bsz", str(bsz),
               "--size", str(s)] + (["--tiny"] if tiny else [])
        if checkpoint:
            cmd += ["--checkpoint", checkpoint]
        if unet_ckpt:
            cmd += ["--unet_ckpt", unet_ckpt]
        if task:
            cmd += ["--task_episodes"]
        rc = subprocess.call(cmd)
        if rc != 0:
            raise SystemExit(f"worker for mode '{mode}' failed rc={rc}")

    base = np.load(mode_npz("base"))["masks"]
    results = [_compare(m, np.load(mode_npz(m))["masks"], base)
               for m in modes]

    if "lsb" in [r["mode"] for r in results]:
        floor = next(r for r in results if r["mode"] == "lsb")
        print("--- verdict vs intrinsic uint8-LSB floor "
              f"({floor['pixel_flip_rate']:.4%} pixel flips) ---",
              flush=True)
        for r in results:
            if r["mode"] == "lsb":
                continue
            if floor["pixel_flip_rate"] > 0:
                ratio = r["pixel_flip_rate"] / floor["pixel_flip_rate"]
                print(f"{r['mode']:6s}: {r['pixel_flip_rate']:.4%} flips = "
                      f"{ratio:.2f}x the intrinsic floor", flush=True)
            else:
                print(f"{r['mode']:6s}: {r['pixel_flip_rate']:.4%} flips "
                      "(intrinsic floor is 0 here; absolute rate shown)",
                      flush=True)


if __name__ == "__main__":
    main()
