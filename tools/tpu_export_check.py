"""Does a TPU-platform serving export (with Pallas Mosaic kernels) work?

Exports the tiny-config episode program ON the TPU backend (attn_impl
"auto" resolves to the Pallas flash kernels at trace time), serializes,
deserializes, and serves one episode — validating that `jax.export`
round-trips Mosaic `tpu_custom_call`s on this jax version, which is what
`cli/export.py` relies on for production TPU artifacts.

Usage: python tools/tpu_export_check.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffews_tpu import checkpoint as C
    from diffews_tpu import serving
    from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                     UNetConfig, VAEConfig)
    from diffews_tpu.models import unet, vae
    from diffews_tpu.pipeline import DiffewsPipeline

    assert jax.default_backend() == "tpu", jax.default_backend()
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)),
        ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)),
        vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    pipe = DiffewsPipeline(bundle, compute_dtype=jnp.bfloat16,
                           attn_impl="pallas")

    t0 = time.time()
    out_dir = serving.save_serving_artifact(
        pipe, tempfile.mkdtemp(prefix="tpu_export_"), bsz=1, nshot=1,
        img_size=64)
    print(f"export+serialize OK in {time.time() - t0:.0f}s "
          f"({os.path.getsize(os.path.join(out_dir, serving.ARTIFACT))} B, "
          f"platforms {serving.load(out_dir).manifest['platforms']})",
          flush=True)

    mod = serving.load(out_dir)
    rng = np.random.default_rng(0)
    pred = mod(rng.integers(0, 255, (1, 64, 64, 3), np.uint8),
               rng.integers(0, 255, (1, 1, 64, 64, 3), np.uint8),
               rng.integers(0, 2, (1, 1, 64, 64), np.uint8))
    s = int(np.asarray(pred, np.int64).sum())
    print(f"deserialized artifact served on TPU: shape {pred.shape} "
          f"checksum {s}")


if __name__ == "__main__":
    main()
