"""AutoencoderKL (SD VAE) as pure functions over an NHWC pytree.

Capability parity with the diffusers VAE the reference loads from its
checkpoints (`evaluation_util/main_oss.py:347-349`;
`train_tools/train_icl_*_v3.py:1086-1096`):

  - `encode_moments` -> 8-channel moments (mean ‖ logvar)
  - eval latents use the posterior **mean** x scaling_factor — the reference's
    deterministic `encode_rgb` (`marigold_pipeline_rgb_latent_noise.py:839-862`)
  - train latents use `sample()` with reparametrized noise
    (`train_icl_*_v3.py:1347-1358`)
  - `decode` -> RGB in [-1, 1]

Param tree keys mirror diffusers module paths (encoder.down_blocks.N...),
see `diffews_tpu.checkpoint` for the loading contract.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from diffews_tpu.configs import VAEConfig
from diffews_tpu.models import layers as L
from diffews_tpu.ops.attention import fused_kv_attention
from diffews_tpu.ops.fused_resnet import fused_norm_conv_out, fused_resnet_block
from diffews_tpu.ops.groupnorm import group_norm_act
from diffews_tpu.utils import init as I

EPS = 1e-6  # VAE GroupNorm epsilon (diffusers AutoencoderKL default)


# "mixed" uses the fused megakernel only where the spatial grid is at least
# this many pixels — the GN layout-copy tax XLA pays scales with the spatial
# size (~1.8 GB/block at 512^2) while the kernel's ~43 TF/s VPU ceiling is
# resolution-independent, so the crossover sits at large grids.
MIXED_MIN_PIXELS = 256 * 256


def _resolve_resnet_impl(impl: str) -> str:
    """"fused" = Pallas megakernel chain on TPU, XLA reference elsewhere
    (`ops/fused_resnet.py`); "mixed" = fused only for blocks with >=
    MIXED_MIN_PIXELS spatial elements (the layout-tax regime); "pallas" =
    force the kernels (interpret mode off-TPU, for tests); "xla" =
    `layers.resnet_block`.  "auto" currently resolves to "xla" pending the
    on-chip A/B (tools/tpu_vae_matrix.py)."""
    if impl != "auto":
        return impl
    return "xla"


def _resnet(p, h, st, *, groups: int, impl: str):
    """One resnet block, threading GN statistics when fused."""
    if impl == "mixed":
        impl = "fused" if h.shape[1] * h.shape[2] >= MIXED_MIN_PIXELS else "xla"
        st = st if impl == "fused" else None
    if impl in ("fused", "pallas"):
        k = "auto" if impl == "fused" else "pallas"
        return fused_resnet_block(p, h, st, groups=groups, eps=EPS, impl=k)
    return L.resnet_block(p, h, None, groups=groups, eps=EPS), None


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _mid_attention(p, x: jax.Array, groups: int, attn_impl: str) -> jax.Array:
    """Single-head full-channel attention over spatial tokens (VAE mid block).

    At 512px this is 4096 tokens x 512 channels: the dense form materializes
    a (B, 4096, 4096) fp32 probability tensor in HBM (67 MB per image), so on
    TPU it routes through the Pallas flash kernel like the UNet attention.
    """
    b, h, w, c = x.shape
    residual = x
    y = L.group_norm(p["group_norm"], x, groups=groups, eps=EPS)
    y = y.reshape(b, h * w, c)
    q = L.linear(p["to_q"], y)[:, :, None, :]  # 1 head
    k = L.linear(p["to_k"], y)[:, :, None, :]
    v = L.linear(p["to_v"], y)[:, :, None, :]
    o = fused_kv_attention(q, k, v, None, None, impl=attn_impl)[:, :, 0, :]
    o = L.linear(p["to_out"]["0"], o)
    return o.reshape(b, h, w, c) + residual


def _mid_block(p, x: jax.Array, st, groups: int, attn_impl: str, impl: str):
    x, st = _resnet(p["resnets"]["0"], x, st, groups=groups, impl=impl)
    x = _mid_attention(p["attentions"]["0"], x, groups, attn_impl)
    x, st = _resnet(p["resnets"]["1"], x, None, groups=groups, impl=impl)
    return x, st


def encode_moments(params, cfg: VAEConfig, x: jax.Array,
                   attn_impl: str = "auto",
                   resnet_impl: str = "auto") -> jax.Array:
    """NHWC image in [-1,1] -> (B, H/8, W/8, 2*latent) moments."""
    impl = _resolve_resnet_impl(resnet_impl)
    p = params["encoder"]
    g = cfg.norm_num_groups
    h = L.conv2d(p["conv_in"], x)
    st = None  # GN stats chained between fused blocks; None at the seams
    n = len(cfg.block_out_channels)
    for i in range(n):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h, st = _resnet(blk["resnets"][str(j)], h, st, groups=g, impl=impl)
        if i < n - 1:
            h = L.downsample2d(blk["downsamplers"]["0"], h, asymmetric_pad=True)
            st = None
    h, st = _mid_block(p["mid_block"], h, st, g, attn_impl, impl)
    if impl in ("fused", "pallas"):
        h = fused_norm_conv_out(p["conv_norm_out"], p["conv_out"], h, st,
                                groups=g, eps=EPS,
                                impl="auto" if impl == "fused" else "pallas")
    else:
        h = group_norm_act(p["conv_norm_out"], h, groups=g, eps=EPS, act="silu")
        h = L.conv2d(p["conv_out"], h)
    return L.conv2d(params["quant_conv"], h, padding=0)


def encode_mean_latent(params, cfg: VAEConfig, x: jax.Array,
                       attn_impl: str = "auto",
                       resnet_impl: str = "auto") -> jax.Array:
    """Deterministic latent: posterior mean x scaling_factor (eval path)."""
    moments = encode_moments(params, cfg, x, attn_impl, resnet_impl)
    mean = moments[..., : cfg.latent_channels]
    return mean * cfg.scaling_factor


def sample_latent(params, cfg: VAEConfig, x: jax.Array, rng: jax.Array,
                  attn_impl: str = "auto",
                  resnet_impl: str = "auto") -> jax.Array:
    """Reparametrized posterior sample x scaling_factor (train path)."""
    moments = encode_moments(params, cfg, x, attn_impl, resnet_impl)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    noise = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    return (mean + std * noise) * cfg.scaling_factor


def decode(params, cfg: VAEConfig, z: jax.Array,
           attn_impl: str = "auto",
           resnet_impl: str = "auto") -> jax.Array:
    """Scaled latent -> NHWC image (unclipped; pipeline clips to [-1,1])."""
    impl = _resolve_resnet_impl(resnet_impl)
    z = z / cfg.scaling_factor
    z = L.conv2d(params["post_quant_conv"], z, padding=0)
    p = params["decoder"]
    g = cfg.norm_num_groups
    h = L.conv2d(p["conv_in"], z)
    h, st = _mid_block(p["mid_block"], h, None, g, attn_impl, impl)
    n = len(cfg.block_out_channels)
    for i in range(n):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h, st = _resnet(blk["resnets"][str(j)], h, st, groups=g, impl=impl)
        if i < n - 1:
            h = L.upsample2d(blk["upsamplers"]["0"], h)
            st = None
    # "mixed" ends at full resolution where the fused blocks ran, so the
    # output norm+conv belongs to the fused chain there too
    if impl in ("fused", "pallas") or (
            impl == "mixed" and h.shape[1] * h.shape[2] >= MIXED_MIN_PIXELS):
        return fused_norm_conv_out(p["conv_norm_out"], p["conv_out"], h, st,
                                   groups=g, eps=EPS,
                                   impl="pallas" if impl == "pallas" else "auto")
    h = group_norm_act(p["conv_norm_out"], h, groups=g, eps=EPS, act="silu")
    return L.conv2d(p["conv_out"], h)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _resnet_params(r: I.RngStream, cin: int, cout: int) -> dict:
    p = {
        "norm1": I.norm_params(cin),
        "conv1": I.conv_params(r(), 3, 3, cin, cout),
        "norm2": I.norm_params(cout),
        "conv2": I.conv_params(r(), 3, 3, cout, cout),
    }
    if cin != cout:
        p["conv_shortcut"] = I.conv_params(r(), 1, 1, cin, cout)
    return p


def _mid_params(r: I.RngStream, c: int) -> dict:
    return {
        "resnets": {"0": _resnet_params(r, c, c), "1": _resnet_params(r, c, c)},
        "attentions": {
            "0": {
                "group_norm": I.norm_params(c),
                "to_q": I.linear_params(r(), c, c),
                "to_k": I.linear_params(r(), c, c),
                "to_v": I.linear_params(r(), c, c),
                "to_out": {"0": I.linear_params(r(), c, c)},
            }
        },
    }


def init_params(rng, cfg: VAEConfig) -> dict:
    r = I.RngStream(rng)
    chans = cfg.block_out_channels
    n = len(chans)

    enc_down = {}
    cin = chans[0]
    for i in range(n):
        cout = chans[i]
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _resnet_params(r, cin if j == 0 else cout, cout)
        if i < n - 1:
            blk["downsamplers"] = {"0": {"conv": I.conv_params(r(), 3, 3, cout, cout)}}
        enc_down[str(i)] = blk
        cin = cout

    encoder = {
        "conv_in": I.conv_params(r(), 3, 3, cfg.in_channels, chans[0]),
        "down_blocks": enc_down,
        "mid_block": _mid_params(r, chans[-1]),
        "conv_norm_out": I.norm_params(chans[-1]),
        "conv_out": I.conv_params(r(), 3, 3, chans[-1], 2 * cfg.latent_channels),
    }

    rev = list(reversed(chans))
    dec_up = {}
    cin = rev[0]
    for i in range(n):
        cout = rev[i]
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = _resnet_params(r, cin if j == 0 else cout, cout)
        if i < n - 1:
            blk["upsamplers"] = {"0": {"conv": I.conv_params(r(), 3, 3, cout, cout)}}
        dec_up[str(i)] = blk
        cin = cout

    decoder = {
        "conv_in": I.conv_params(r(), 3, 3, cfg.latent_channels, rev[0]),
        "mid_block": _mid_params(r, rev[0]),
        "up_blocks": dec_up,
        "conv_norm_out": I.norm_params(rev[-1]),
        "conv_out": I.conv_params(r(), 3, 3, rev[-1], cfg.out_channels),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": I.conv_params(r(), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels),
        "post_quant_conv": I.conv_params(r(), 1, 1, cfg.latent_channels, cfg.latent_channels),
    }
