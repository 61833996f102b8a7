"""5-shot b8 with chunked VAE encode: does the big graph now compile?

5-shot at --bsz 8 encodes 88 images in one flat batch and crashes the
remote compile helper (HTTP 500).  --encode_chunks shrinks the encode
HLO ~N-fold via lax.map; this measures compile success + steady q/s.

Usage: python tools/tpu_5shot_chunked.py [--bsz 8] [--chunks 11]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bsz", type=int, default=8)
    ap.add_argument("--nshot", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=11)
    ap.add_argument("--vae", choices=["xla", "int8"], default="xla",
                    help="int8: opt-in W8A8 VAE (ops/quant.py) — 5-shot is "
                         "encode-heavy (88 images at b8), the int8 win "
                         "should exceed the 1-shot one")
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
    pipe = DiffewsPipeline(bundle, compute_dtype=jnp.bfloat16,
                           encode_chunks=args.chunks, vae_impl=args.vae)

    b, n, s = args.bsz, args.nshot, 512
    rng = np.random.default_rng(0)
    mk = lambda seed: (
        np.random.default_rng(seed).integers(0, 256, (b, s, s, 3), np.uint8),
        np.random.default_rng(seed + 1).integers(0, 256, (b, n, s, s, 3), np.uint8),
        np.random.default_rng(seed + 2).integers(0, 2, (b, n, s, s), np.uint8),
    )
    t0 = time.time()
    pipe.predict(*mk(0), r_threshold=0.25)
    print(f"compile+first OK: {time.time() - t0:.0f}s "
          f"(bsz {b}, {n}-shot, chunks {args.chunks})", flush=True)

    # steady state, depth-2 pipelined
    k = 4
    inputs = [mk(i * 3 + 10) for i in range(k)]
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pend = []
        for inp in inputs:
            pend.append(pipe.predict_async(*inp, r_threshold=0.25))
            if len(pend) >= 2:
                pend.pop(0).result()
        while pend:
            pend.pop(0).result()
        best = min(best, time.perf_counter() - t0)
    print(f"{b * k / best:.2f} q/s ({n}-shot, b{b}, chunks {args.chunks}, "
          f"depth-2, uint8 h2d)", flush=True)


if __name__ == "__main__":
    main()
