"""Minimal library-level usage: one few-shot episode through the pipeline.

Runs on CPU with a tiny random-init model so it works anywhere; swap the
bundle construction for `DiffewsPipeline.from_pretrained("<checkpoint>")`
with a real diffusers-layout SD-2.1 DiffewS checkpoint (the reference's
format) and raise `img_size` to 512 for real use.

    python examples/predict_episode.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Select the platform WITHOUT querying backends (jax.default_backend()
# would initialize — and on a machine that pins a remote TPU platform,
# claim or hang on — the device).  Set DIFFEWS_EXAMPLE_TPU=1 to run on
# the machine's default (TPU) backend instead.
if not os.environ.get("DIFFEWS_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig, UNetConfig,
                                 VAEConfig)
from diffews_tpu.models import unet, vae
from diffews_tpu.pipeline import DiffewsPipeline


def main():
    # --- build a pipeline (real use: DiffewsPipeline.from_pretrained) ----
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)),
        ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)),
        vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    pipe = DiffewsPipeline(bundle)

    # --- one episode: a query image + n support (image, mask) pairs -----
    # uint8 fast-ingestion path: raw 0..255 images, {0,1} masks;
    # normalization happens in-graph.
    b, n, s = 1, 2, 64
    rng = np.random.default_rng(0)
    query = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    supports = rng.integers(0, 255, (b, n, s, s, 3), np.uint8)
    support_masks = (rng.random((b, n, s, s)) > 0.5).astype(np.uint8)

    out = pipe.predict(query, supports, support_masks, r_threshold=0.25)
    print("prediction:", out.seg_colored.shape, out.seg_colored.dtype)
    print("binary mask pixels on:", int(out.mask.sum()))

    # --- async serving pattern (what the eval harness does) -------------
    pending = [pipe.predict_async(query, supports, support_masks,
                                  r_threshold=0.25) for _ in range(3)]
    for p in pending:
        _ = p.result()
    print("3 episodes served with dispatch-ahead overlap")

    # --- repeated-support serving: cache the support set once -----------
    # One annotated support set serving many queries skips the support VAE
    # encodes and the UNet support stream per query (the reference
    # recomputes both every episode).
    cache = pipe.precompute_supports(supports, support_masks)
    query_batch = rng.integers(0, 255, (4, s, s, 3), np.uint8)
    out = pipe.predict_cached(query_batch, cache, r_threshold=0.25)
    print("4 queries served against the cached support set:",
          out.seg_colored.shape)


if __name__ == "__main__":
    main()
