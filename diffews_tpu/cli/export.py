"""Export an AOT serving artifact (StableHLO program + weights msgpack).

    python -m diffews_tpu.cli.export --checkpoint <ckpt> --out <dir> \
        [--bsz 8] [--nshot 1] [--img-size 512] [--vae_impl xla] \
        [--unet_ckpt_path <dir>/unet]

The artifact serves episodes with no model code (`diffews_tpu.serving.load`);
run this ON the serving platform (the program lowers for the platform it is
exported from — TPU exports carry the Pallas Mosaic kernels).  The reference
has no deployment path beyond running its eval script (`main_oss.py`).
"""

from __future__ import annotations

import argparse

from diffews_tpu import serving
from diffews_tpu.pipeline import DiffewsPipeline


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--unet_ckpt_path", type=str, default=None,
                   help="fine-tuned UNet dir (like evaluate's flag)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--nshot", type=int, default=1)
    p.add_argument("--img-size", type=int, default=512, dest="img_size")
    p.add_argument("--half_precision", action="store_true", default=False,
                   help="export the bf16 program (recommended for TPU "
                        "serving); default f32, matching evaluate's flag")
    p.add_argument("--attn_impl", type=str, default="auto")
    p.add_argument("--vae_impl", type=str, default="xla",
                   choices=["xla", "fused", "mixed", "auto", "int8"])
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    pipe = DiffewsPipeline.from_pretrained(
        args.checkpoint,
        unet_dir=args.unet_ckpt_path,
        compute_dtype=jnp.bfloat16 if args.half_precision else jnp.float32,
        attn_impl=args.attn_impl,
        vae_impl=args.vae_impl,
    )
    out = serving.save_serving_artifact(
        pipe, args.out, bsz=args.bsz, nshot=args.nshot,
        img_size=args.img_size)
    print(f"serving artifact written to {out} "
          f"(bsz {args.bsz}, {args.nshot}-shot, {args.img_size}px)")
    return out


if __name__ == "__main__":
    main()
