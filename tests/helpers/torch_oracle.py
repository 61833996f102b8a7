"""Independent torch re-implementation of the SD-2.1 UNet/VAE forward.

Purpose: a cross-framework numerical oracle for `diffews_tpu.models.{unet,vae}`
in THIS environment (torch is installed; diffusers is not, and no real
checkpoint exists — see tests/test_golden.py for the diffusers-anchored
goldens that run elsewhere).  This module consumes a flat torch-layout
state dict with diffusers key names — exactly what `diffews_tpu.checkpoint`
writes into `diffusion_pytorch_model.safetensors` — and runs the forward
passes with torch ops (`F.conv2d`, `F.group_norm`, `F.linear`,
`scaled_dot_product_attention`), i.e. a completely different conv/GN/attn
kernel stack and NCHW layouts.  Agreement with the JAX NHWC implementation
pins every parity-critical choice at once: checkpoint key/layout mapping,
GroupNorm epsilons (1e-5 UNet resnets / 1e-6 transformer+VAE), SiLU/GELU
variants, attention scaling, GEGLU chunk order, skip-concat order,
down/upsample padding (incl. the VAE encoder's asymmetric (0,1),(0,1) pad),
and the timestep embedding.

It also implements the reference's TWO-PASS KV-BANK semantics
(`diffews/models/attention_processor.py:251-271`,
`unet_2d_condition.py:656-664`): a ref dispatch that stores every attn1's
K/V, then a target dispatch whose attn1 concatenates
`[own K/V ‖ nshot-folded bank]` — so the joint single-pass JAX UNet is
checked against a literal torch emulation of the reference control flow,
not just against another JAX path.

All math is f32 on CPU.  No code is taken from the reference repo; this is
written from the diffusers SD-2.1 architecture contract that the config
dataclasses document.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F

from diffews_tpu.configs import UNetConfig, VAEConfig

UNET_ATTN_EPS = 1e-6  # Transformer2D GroupNorm
VAE_EPS = 1e-6


def _t(sd, key):
    v = sd[key]
    if not isinstance(v, torch.Tensor):
        v = torch.from_numpy(v.copy())
    return v.float()


_INT8_W8A8 = None  # None = off; else {} (dynamic scales) or {pfx: amax*margin}


class int8_w8a8:
    """Context manager: every ELIGIBLE conv (3x3, in_channels >= 32 — the
    exact `ops/quant.py` site rule) runs the W8A8 scheme instead of fp:
    per-out-channel weight scales `amax/127`, per-tensor activation scale
    (dynamic amax, or static when the conv's diffusers key prefix is in
    `a_scales` — the same dict `calibrate_conv_scales` returns, since our
    param-tree paths mirror diffusers key paths), round-half-even quantize,
    integer conv emulated EXACTLY in f64 (products sum < 2^53), f32
    dequant + bias.  A cross-framework oracle for `ops/quant.py`."""

    def __init__(self, a_scales=None):
        self.a_scales = a_scales or {}

    def __enter__(self):
        global _INT8_W8A8
        _INT8_W8A8 = self.a_scales
        return self

    def __exit__(self, *exc):
        global _INT8_W8A8
        _INT8_W8A8 = None


def _conv(sd, pfx, x, stride=1, padding=1):
    w = _t(sd, pfx + ".weight")
    b = _t(sd, pfx + ".bias")
    if (_INT8_W8A8 is not None and w.shape[2:] == (3, 3)
            and w.shape[1] >= 32):  # OIHW in_channels == HWIO cin
        s_w = (w.abs().amax(dim=(1, 2, 3)) / 127.0).clamp_min(1e-12)
        w8 = torch.clamp(torch.round(w / s_w[:, None, None, None]),
                         -127, 127)
        if pfx in _INT8_W8A8:
            s_a = torch.clamp_min(
                torch.tensor(_INT8_W8A8[pfx], dtype=torch.float32) / 127.0,
                1e-12)
        else:
            s_a = torch.clamp_min(x.abs().amax() / 127.0, 1e-12)
        x8 = torch.clamp(torch.round(x / s_a), -127, 127)
        y = F.conv2d(x8.double(), w8.double(), None, stride=stride,
                     padding=padding)
        return (y.float() * (s_w * s_a)[None, :, None, None]
                + b[None, :, None, None])
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def _gn(sd, pfx, x, groups, eps):
    return F.group_norm(x, groups, _t(sd, pfx + ".weight"),
                        _t(sd, pfx + ".bias"), eps)


def _ln(sd, pfx, x):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, pfx + ".weight"),
                        _t(sd, pfx + ".bias"), 1e-5)


def _lin(sd, pfx, x):
    bias = _t(sd, pfx + ".bias") if pfx + ".bias" in sd else None
    return F.linear(x, _t(sd, pfx + ".weight"), bias)


def _sdpa(q, k, v, heads, attn_mask=None):
    """(B, S, C) x (B, T, C) multi-head attention, scale 1/sqrt(head_dim)."""
    b, s, c = q.shape
    hd = c // heads
    q = q.view(b, s, heads, hd).transpose(1, 2)
    k = k.view(b, k.shape[1], heads, hd).transpose(1, 2)
    v = v.view(b, v.shape[1], heads, hd).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
    return o.transpose(1, 2).reshape(b, s, c)


# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------


def _resnet(sd, pfx, x, temb, groups, eps):
    h = F.silu(_gn(sd, pfx + ".norm1", x, groups, eps))
    h = _conv(sd, pfx + ".conv1", h)
    if temb is not None and pfx + ".time_emb_proj.weight" in sd:
        t = _lin(sd, pfx + ".time_emb_proj", F.silu(temb))
        h = h + t[:, :, None, None]
    h = F.silu(_gn(sd, pfx + ".norm2", h, groups, eps))
    h = _conv(sd, pfx + ".conv2", h)
    if pfx + ".conv_shortcut.weight" in sd:
        x = _conv(sd, pfx + ".conv_shortcut", x, padding=0)
    return x + h


def _geglu_ff(sd, pfx, x):
    h = _lin(sd, pfx + ".net.0.proj", x)
    h, gate = h.chunk(2, dim=-1)
    return _lin(sd, pfx + ".net.2", h * F.gelu(gate))


class _Bank:
    """The reference's per-attn1 K/V bank (`MyAttention.k_bank/v_bank`)."""

    def __init__(self):
        self.kv = []  # list of (k, v) per attn1 site, ref-dispatch order
        self.read = 0

    def store(self, k, v):
        self.kv.append((k, v))

    def take(self):
        k, v = self.kv[self.read]
        self.read += 1
        return k, v


def _attn1(sd, pfx, x, heads, bank, mode, batch, key_bias=None):
    """Self-attention with the reference's bank semantics.

    mode "plain": ordinary self-attention.
    mode "store": self-attention over own tokens, K/V stored in the bank
      (ref dispatch; the stored K/V keep the folded (B*N, S, C) batch).
    mode "concat": own K/V concatenated with the nshot-folded bank along
      the sequence axis, own tokens FIRST (`attention_processor.py:258,267`).
    key_bias: optional (B, N*S_ref) additive logit bias on the bank tokens
      (attn-mask variant, `attention_processor_attnmask.py:213-244`).
    """
    q = _lin(sd, pfx + ".to_q", x)
    k = _lin(sd, pfx + ".to_k", x)
    v = _lin(sd, pfx + ".to_v", x)
    attn_mask = None
    if mode == "store":
        bank.store(k, v)
    elif mode == "concat":
        kb, vb = bank.take()
        rn, s, c = kb.shape
        kb = kb.view(batch, (rn // batch) * s, c)
        vb = vb.view(batch, (rn // batch) * s, c)
        if key_bias is not None:
            own_zeros = torch.zeros(batch, k.shape[1])
            attn_mask = torch.cat([own_zeros, key_bias], dim=1)[:, None, None, :]
        k = torch.cat([k, kb], dim=1)
        v = torch.cat([v, vb], dim=1)
    o = _sdpa(q, k, v, heads, attn_mask=attn_mask)
    return _lin(sd, pfx + ".to_out.0", o)


def _transformer2d(sd, pfx, x, ctx, heads, cfg: UNetConfig, bank, mode,
                   key_bias=None):
    b, c, hh, ww = x.shape
    residual = x
    h = _gn(sd, pfx + ".norm", x, cfg.norm_num_groups, UNET_ATTN_EPS)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    if cfg.use_linear_projection:
        h = _lin(sd, pfx + ".proj_in", h)
    else:
        h = _conv(sd, pfx + ".proj_in",
                  h.reshape(b, hh, ww, c).permute(0, 3, 1, 2), padding=0)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    for i in range(cfg.transformer_layers_per_block):
        t = f"{pfx}.transformer_blocks.{i}"
        h = h + _attn1(sd, t + ".attn1", _ln(sd, t + ".norm1", h), heads,
                       bank, mode, b, key_bias=key_bias)
        a2q = _ln(sd, t + ".norm2", h)
        q = _lin(sd, t + ".attn2.to_q", a2q)
        k = _lin(sd, t + ".attn2.to_k", ctx)
        v = _lin(sd, t + ".attn2.to_v", ctx)
        h = h + _lin(sd, t + ".attn2.to_out.0", _sdpa(q, k, v, heads))
        h = h + _geglu_ff(sd, t + ".ff", _ln(sd, t + ".norm3", h))
    if cfg.use_linear_projection:
        h = _lin(sd, pfx + ".proj_out", h)
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    else:
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        h = _conv(sd, pfx + ".proj_out", h, padding=0)
    return h + residual


def _timestep_embedding(ts, dim, flip_sin_to_cos, downscale_freq_shift):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = torch.exp(exponent)[None, :] * ts.float()[:, None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def unet_forward(sd, cfg: UNetConfig, sample, timestep, ctx,
                 bank=None, mode="plain", conv_in_key="conv_in",
                 key_bias_by_sid=None):
    """One UNet dispatch (NCHW).  mode/bank implement the reference's
    two-pass semantics; conv_in_key selects conv_in vs conv_in_ref.
    key_bias_by_sid: optional {scale_id: (B, N*gh*gw) bias} for the
    attn-mask variant; scale-id mapping down[i]=i / mid=n-1 / up[i]=n-1-i
    (`unet_2d_condition_attn.py:645-666`)."""
    kb = key_bias_by_sid or {}
    b = sample.shape[0]
    ts = torch.as_tensor([timestep] * b)
    t_emb = _timestep_embedding(ts, cfg.block_out_channels[0],
                                cfg.flip_sin_to_cos, cfg.freq_shift)
    temb = _lin(sd, "time_embedding.linear_1", t_emb)
    temb = _lin(sd, "time_embedding.linear_2", F.silu(temb))

    g, eps = cfg.norm_num_groups, cfg.norm_eps
    n = cfg.num_levels
    h = _conv(sd, conv_in_key, sample)

    down_states = [h]
    for i in range(n):
        pfx = f"down_blocks.{i}"
        with_attn = cfg.down_block_types[i] == "CrossAttnDownBlock2D"
        heads = cfg.num_attention_heads[i]
        for j in range(cfg.layers_per_block):
            h = _resnet(sd, f"{pfx}.resnets.{j}", h, temb, g, eps)
            if with_attn:
                h = _transformer2d(sd, f"{pfx}.attentions.{j}", h, ctx,
                                   heads, cfg, bank, mode,
                                   key_bias=kb.get(i))
            down_states.append(h)
        if i < n - 1:
            h = _conv(sd, f"{pfx}.downsamplers.0.conv", h, stride=2, padding=1)
            down_states.append(h)

    h = _resnet(sd, "mid_block.resnets.0", h, temb, g, eps)
    h = _transformer2d(sd, "mid_block.attentions.0", h, ctx,
                       cfg.num_attention_heads[-1], cfg, bank, mode,
                       key_bias=kb.get(n - 1))
    h = _resnet(sd, "mid_block.resnets.1", h, temb, g, eps)

    for i in range(n):
        pfx = f"up_blocks.{i}"
        with_attn = cfg.up_block_types[i] == "CrossAttnUpBlock2D"
        heads = cfg.num_attention_heads[n - 1 - i]
        for j in range(cfg.layers_per_block + 1):
            skip = down_states.pop()
            h = torch.cat([h, skip], dim=1)
            h = _resnet(sd, f"{pfx}.resnets.{j}", h, temb, g, eps)
            if with_attn:
                h = _transformer2d(sd, f"{pfx}.attentions.{j}", h, ctx,
                                   heads, cfg, bank, mode,
                                   key_bias=kb.get(n - 1 - i))
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(sd, f"{pfx}.upsamplers.0.conv", h)

    h = F.silu(_gn(sd, "conv_norm_out", h, g, eps))
    return _conv(sd, "conv_out", h)


def unet_two_pass(sd, cfg: UNetConfig, sample, timestep, ctx, ref_sample,
                  ref_ctx=None):
    """The reference's eval control flow (`marigold_pipeline...py:706-725`):
    clear bank -> ref dispatch (stores K/V) -> target dispatch (concats) ->
    returns the target prediction.  ref_sample: (B, N, Cref, H, W)."""
    b, nshot = ref_sample.shape[:2]
    ref_flat = ref_sample.reshape(b * nshot, *ref_sample.shape[2:])
    if ref_ctx is None:
        ref_ctx = ctx.repeat_interleave(nshot, dim=0)
    bank = _Bank()
    unet_forward(sd, cfg, ref_flat, timestep, ref_ctx, bank=bank,
                 mode="store", conv_in_key="conv_in_ref")
    bank.read = 0
    return unet_forward(sd, cfg, sample, timestep, ctx, bank=bank,
                        mode="concat")


def unet_two_pass_attnmask(sd, cfg: UNetConfig, sample, timestep, ctx,
                           ref_sample, ref_mask):
    """The ATTN-MASK variant's two-pass flow
    (`unet_2d_condition_attn.py` + `attention_processor_attnmask.py`):
    the support stream shares the 4-ch `conv_in`, and the target pass
    biases every bank key by `(1-mask)*-1e4` with the support mask
    nearest-resized to each scale's token grid.

    ref_sample: (B, N, in_channels, H, W); ref_mask: (B, N, Hm, Wm) binary.
    """
    b, nshot = ref_sample.shape[:2]
    ref_flat = ref_sample.reshape(b * nshot, *ref_sample.shape[2:])
    ref_ctx = ctx.repeat_interleave(nshot, dim=0)
    bank = _Bank()
    unet_forward(sd, cfg, ref_flat, timestep, ref_ctx, bank=bank,
                 mode="store", conv_in_key="conv_in")
    bank.read = 0
    lat_h, lat_w = sample.shape[2], sample.shape[3]
    flat_mask = ref_mask.reshape(b * nshot, 1, *ref_mask.shape[2:]).float()
    biases = {}
    for sid in range(cfg.num_levels):
        gh, gw = lat_h // (2 ** sid), lat_w // (2 ** sid)
        m = F.interpolate(flat_mask, size=(gh, gw), mode="nearest")
        biases[sid] = (1.0 - m.reshape(b, nshot * gh * gw)) * -10000.0
    return unet_forward(sd, cfg, sample, timestep, ctx, bank=bank,
                        mode="concat", key_bias_by_sid=biases)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_mid(sd, pfx, h, groups):
    h = _resnet(sd, f"{pfx}.resnets.0", h, None, groups, VAE_EPS)
    a = f"{pfx}.attentions.0"
    b, c, hh, ww = h.shape
    residual = h
    y = _gn(sd, a + ".group_norm", h, groups, VAE_EPS)
    y = y.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q = _lin(sd, a + ".to_q", y)
    k = _lin(sd, a + ".to_k", y)
    v = _lin(sd, a + ".to_v", y)
    o = _lin(sd, a + ".to_out.0", _sdpa(q, k, v, heads=1))
    h = o.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + residual
    return _resnet(sd, f"{pfx}.resnets.1", h, None, groups, VAE_EPS)


def vae_encode_moments(sd, cfg: VAEConfig, x):
    """NCHW image -> (B, 2*latent, H/2^k, W/2^k) moments (quant_conv incl.)."""
    g = cfg.norm_num_groups
    n = len(cfg.block_out_channels)
    h = _conv(sd, "encoder.conv_in", x)
    for i in range(n):
        pfx = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            h = _resnet(sd, f"{pfx}.resnets.{j}", h, None, g, VAE_EPS)
        if i < n - 1:
            # diffusers VAE Downsample2D: explicit asymmetric (0,1),(0,1) pad
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(sd, f"{pfx}.downsamplers.0.conv", h, stride=2, padding=0)
    h = _vae_mid(sd, "encoder.mid_block", h, g)
    h = F.silu(_gn(sd, "encoder.conv_norm_out", h, g, VAE_EPS))
    h = _conv(sd, "encoder.conv_out", h)
    return _conv(sd, "quant_conv", h, padding=0)


def vae_decode(sd, cfg: VAEConfig, z):
    """Scaled latent (NCHW) -> image; mirrors `vae.decode` incl. 1/scaling."""
    g = cfg.norm_num_groups
    n = len(cfg.block_out_channels)
    z = z / cfg.scaling_factor
    z = _conv(sd, "post_quant_conv", z, padding=0)
    h = _conv(sd, "decoder.conv_in", z)
    h = _vae_mid(sd, "decoder.mid_block", h, g)
    for i in range(n):
        pfx = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(sd, f"{pfx}.resnets.{j}", h, None, g, VAE_EPS)
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(sd, f"{pfx}.upsamplers.0.conv", h)
    h = F.silu(_gn(sd, "decoder.conv_norm_out", h, g, VAE_EPS))
    return _conv(sd, "decoder.conv_out", h)
