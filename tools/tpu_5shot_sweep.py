"""Same-session 5-shot operating-point sweep: bsz x encode_chunks x depth.

Why: 5-shot throughput numbers drift with tunnel/chip state ACROSS
sessions (CLAUDE.md), so the b8-worse-than-b4 anomaly (4.7 vs 5.68 q/s,
PERF.md) can only be diagnosed with one-process A/B pairs.  Suspects:
  - the 2x44 lax.map encode serializes what b4 runs as one flat 44;
  - depth-2 dispatch doubles the resident working set -> XLA spills at
    the 5-shot b8 episode size.
All configs share ONE pipeline's param arrays (no extra HBM); each gets
a fresh jit wrapper because `encode_chunks` is read at trace time.

Usage: python tools/tpu_5shot_sweep.py [--configs b4c0d2,b8c0d2,b8c4d2,b8c0d1]
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str,
                    default="b4c0d2,b8c0d2,b8c4d2,b8c0d1",
                    help="comma list of b<bsz>c<encode_chunks>d<depth>")
    ap.add_argument("--nshot", type=int, default=5)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffews_tpu import checkpoint as C
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
    base = DiffewsPipeline(bundle, compute_dtype=jnp.bfloat16)
    n, s = args.nshot, 512

    def variant(chunks):
        p = DiffewsPipeline.__new__(DiffewsPipeline)
        p.__dict__.update(base.__dict__)
        p.encode_chunks = chunks
        p._predict_jit = jax.jit(
            p._predict_impl, static_argnames=("denoising_steps",))
        return p

    def mk(b, seed):
        """Episode tensors PRE-UPLOADED and force-synced: h2d is lazy on
        the tunnel and otherwise lands inside the timed loop (~48 MB/batch
        at 5-shot b8 ~ 2.4 s at tunnel rates — it dominated the first
        version of this sweep and masked the device-side signal)."""
        arrs = (
            np.random.default_rng(seed).integers(0, 256, (b, s, s, 3), np.uint8),
            np.random.default_rng(seed + 1).integers(
                0, 256, (b, n, s, s, 3), np.uint8),
            np.random.default_rng(seed + 2).integers(0, 2, (b, n, s, s), np.uint8),
        )
        import jax.numpy as jnp
        dev = tuple(jax.device_put(a) for a in arrs)
        for d in dev:
            int(jnp.sum(d.astype(jnp.int32)) % 7)  # host read = honest sync
        return dev

    for spec in args.configs.split(","):
        m = re.fullmatch(r"b(\d+)c(\d+)d(\d+)", spec.strip())
        b, chunks, depth = (int(g) for g in m.groups())
        p = variant(chunks)
        t0 = time.time()
        p.predict(*mk(b, 0), r_threshold=0.25)
        print(f"[{spec}] compile+first {time.time() - t0:.0f}s", flush=True)
        inputs = [mk(b, i * 3 + 10) for i in range(args.batches)]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pend = []
            for inp in inputs:
                pend.append(p.predict_async(*inp, r_threshold=0.25))
                if len(pend) >= depth:
                    pend.pop(0).result()
            while pend:
                pend.pop(0).result()
            best = min(best, time.perf_counter() - t0)
        print(f"[{spec}] {b * args.batches / best:.2f} q/s "
              f"({n}-shot, depth-{depth}, uint8 h2d)", flush=True)


if __name__ == "__main__":
    main()
