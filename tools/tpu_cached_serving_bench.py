"""Repeated-support serving A/B: full episodes vs the support-KV cache.

The eval protocol samples a fresh support set per episode (bench.py measures
that), but the dominant production pattern is ONE annotated support set
serving many queries (segment a dataset/video with a fixed exemplar).  The
reference recomputes the support VAE encodes + support UNet pass per query
(`marigold_pipeline_rgb_latent_noise.py:649-651,719-720`); our
`DiffewsPipeline.precompute_supports` captures the per-site support K/V once
and `predict_cached` serves query-only episodes against it.

Usage: python tools/tpu_cached_serving_bench.py [--nshot N] [--bsz B]
    [--bszs 8,16] [--modes bf16,int8[,int8u]] [--skip_full]
Prints q/s for both paths with the bench.py methodology (uint8 ingestion,
pre-forced uploads, depth-2 pipelined dispatch, best-of-2, host-read sync).
`--modes`/`--bszs` run a same-session matrix in ONE process (cross-session
numbers drift with tunnel/chip state — CLAUDE.md): bf16, int8 (W8A8 VAE),
int8u (int8 VAE + int8 UNet attn/FFN linears).  `--skip_full` measures only
the cached path (the full-episode baseline is bench.py's headline).
"""

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

dt = jnp.bfloat16


def _arg(flag, default):
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def _measure(dispatch, k_batches=6, depth=2):
    """Best-of-2 chained throughput; dispatch(i) must return a device scalar."""
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        pending = []
        for i in range(k_batches):
            pending.append(dispatch(i))
            if len(pending) >= depth:
                int(pending.pop(0))  # host read = honest sync on the tunnel
        while pending:
            int(pending.pop(0))
        best = min(best, time.perf_counter() - t0)
    return best


MODES = {  # mode name -> DiffewsPipeline kwargs
    "bf16": {},
    "int8": {"vae_impl": "int8"},
    "int8u": {"vae_impl": "int8", "unet_int8": True},
}


def main():
    nshot = _arg("--nshot", 1)
    bszs = [int(x) for x in
            (sys.argv[sys.argv.index("--bszs") + 1].split(",")
             if "--bszs" in sys.argv else [_arg("--bsz", 8)])]
    modes = (sys.argv[sys.argv.index("--modes") + 1].split(",")
             if "--modes" in sys.argv else ["bf16"])
    skip_full = "--skip_full" in sys.argv
    s = 512

    ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
    if "--tiny" in sys.argv:  # CPU smoke test of the script itself
        import jax as _j
        _j.config.update("jax_platforms", "cpu")
        ucfg, vcfg, s = UNetConfig.tiny(), VAEConfig.tiny(), 32
    if not set(modes) <= MODES.keys():  # fail fast, BEFORE param init
        raise SystemExit(f"unknown --modes {sorted(set(modes) - MODES.keys())}"
                         f"; valid: {sorted(MODES)}")
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    # Pull the f32 init trees to HOST: each mode's pipeline casts them to
    # device itself, and keeping the ~3.8 GB f32 originals resident for the
    # whole mode x batch matrix shifts the OOM edge on a 16 GB v5e (the
    # try/except below would then mask real capacity as FAILED cells).
    up, vp = jax.device_get(up), jax.device_get(vp)
    bundle = ckpt_lib.PipelineBundle(
        up, ucfg, vp, vcfg, None, CLIPTextConfig.sd21(),
        SchedulerConfig.diffews())

    rng = np.random.default_rng(0)
    sup1 = jnp.asarray(rng.integers(0, 256, (1, nshot, s, s, 3)), jnp.uint8)
    msk1 = jnp.asarray((rng.random((1, nshot, s, s)) > 0.5), jnp.uint8)
    bmax = max(bszs)
    qmax = [jnp.asarray(rng.integers(0, 256, (bmax, s, s, 3)), jnp.uint8)
            for _ in range(6)]
    for a in qmax + [sup1, msk1]:  # force uploads (lazy h2d pollutes, PERF.md)
        float(a.astype(jnp.float32).sum())

    results = {}
    for mode in modes:
        pipe = DiffewsPipeline(bundle, compute_dtype=dt, attn_impl="auto",
                               **MODES[mode])
        text = pipe.empty_text_embed
        cachedf = jax.jit(lambda u, v, q, e, t: pipe._predict_cached_impl(
            u, v, q, e, None, t).astype(jnp.int32).sum())

        t0 = time.time()
        cache = pipe.precompute_supports(sup1, msk1)
        jax.block_until_ready(cache.entries)
        nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(cache.entries))
        float(cache.entries[0][0].astype(jnp.float32).sum())  # honest sync
        print(f"[{mode}] precompute_supports (incl compile): "
              f"{time.time()-t0:.1f}s, cache {nbytes/1e6:.0f} MB", flush=True)

        def run_bsz(b):
            queries = [q[:b] for q in qmax]
            for q in queries:
                float(q.astype(jnp.float32).sum())  # slices re-upload
            t0 = time.time()
            int(cachedf(pipe.unet_params, pipe.vae_params, queries[0],
                        cache.entries, text))
            print(f"[{mode}] cached b{b} compile+first: "
                  f"{time.time()-t0:.0f}s", flush=True)
            dt_c = _measure(lambda i: cachedf(
                pipe.unet_params, pipe.vae_params, queries[i], cache.entries,
                text))
            results[(mode, b, "cached")] = 6 * b / dt_c
            print(f"[{mode}] cached  b{b} {nshot}-shot: {6*b/dt_c:7.2f} q/s "
                  f"({dt_c/6*1e3:.0f} ms/batch)", flush=True)

            if skip_full:
                return
            supb = jnp.broadcast_to(sup1, (b,) + sup1.shape[1:])
            mskb = jnp.broadcast_to(msk1, (b,) + msk1.shape[1:])
            for a in (supb, mskb):
                float(a.astype(jnp.float32).sum())
            fullf = jax.jit(lambda u, v, q, sp, m, t: pipe._predict_impl(
                u, v, q, sp, m, t, None, 1).astype(jnp.int32).sum())
            t0 = time.time()
            int(fullf(pipe.unet_params, pipe.vae_params, queries[0], supb,
                      mskb, text))
            print(f"[{mode}] full b{b} compile+first: {time.time()-t0:.0f}s",
                  flush=True)
            dt_f = _measure(lambda i: fullf(
                pipe.unet_params, pipe.vae_params, queries[i], supb, mskb,
                text))
            results[(mode, b, "full")] = 6 * b / dt_f
            print(f"[{mode}] full    b{b} {nshot}-shot: {6*b/dt_f:7.2f} q/s "
                  f"({dt_f/6*1e3:.0f} ms/batch)  "
                  f"cached speedup {dt_f/dt_c:.2f}x", flush=True)

        for b in bszs:
            try:
                run_bsz(b)
            except Exception as e:  # keep the rest of the matrix (e.g. OOM)
                print(f"[{mode}] b{b} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        del pipe, cachedf, cache  # free HBM before the next mode's params

    print("--- summary (same-session) ---", flush=True)
    for (mode, b, kind), qps in sorted(results.items()):
        print(f"{mode:6s} b{b:<3d} {kind:6s} {qps:7.2f} q/s", flush=True)


if __name__ == "__main__":
    main()
