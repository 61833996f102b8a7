"""SD-2.1 conditional UNet with KV-fusion in-context conditioning (TPU-native).

Re-design of the reference's `MyUNet2DConditionModel`
(`diffews/models/unet_2d_condition.py:185-1257`) and its banked attention
(`diffews/models/attention_processor.py:251-271`).  The reference runs TWO
stateful UNet dispatches — a "reference" pass over the 8-channel
support(+mask) latents that mutates per-layer `k_bank`/`v_bank`, then a
"target" pass over the 4-channel query latent whose self-attentions
concatenate the banked K/V.  Here both streams run in ONE functional forward:

  - support rows (B*N) enter through `conv_in_ref`, query rows (B) through
    `conv_in`, then the streams are CONCATENATED ALONG BATCH so every conv,
    resnet, cross-attention and FFN processes them together (bigger batches
    on the MXU, one dispatch, no Python-side mutation);
  - at each self-attention the streams split: support rows self-attend,
    query rows attend over `[own K/V ‖ shot-folded support K/V]` — the
    exact math of `MyXFormersAttnProcessor` (`attention_processor.py:251-271`)
    — via `diffews_tpu.ops.attention.fused_kv_attention` (XLA dense or
    Pallas flash kernel);
  - variable n-shot uses padding + `shot_mask` (-inf bias on padded shots),
    so 1..max_shot training jits once with static shapes;
  - gradients flow from the query loss into the support stream through the
    fused K/V automatically — the reference's `ref_pred * 0.` DDP hack
    (`train_tools/train_icl_*_v3.py:1381`) has no equivalent here.

The support rows' final `conv_norm_out`/`conv_out` are skipped: the
reference computes them but multiplies the result by zero (train) or drops
it (eval), so this is pure dead compute.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import layers as L
from diffews_tpu.ops.attention import (
    cross_attention,
    dense_attention,
    fused_kv_attention,
    merge_heads,
    shot_parallel_fused_kv_attention,
    split_heads,
)
from diffews_tpu.utils import init as I

ATTN_EPS = 1e-6  # Transformer2D GroupNorm epsilon


# ---------------------------------------------------------------------------
# attention / transformer blocks
# ---------------------------------------------------------------------------


def _attn1(p, h, *, heads, ref_rows, n_shots, shot_mask, attn_impl,
           sup_bias=None, shot_axis=None, kv_capture=None, kv_iter=None):
    """Self-attention with KV fusion between the two streams.

    h: (R+B, S, C) where the first R = B*n_shots rows are the support
    stream.  With ref_rows=None this is plain self-attention.

    kv_capture: trace-internal list — the folded support-stream K/V (and
    the attn-mask bias, if any) of this site are appended as a
    `(k_sup, v_sup, bias)` tuple (support-KV cache build; see
    `forward`'s kv_capture doc).
    kv_iter: iterator over previously captured `(k_sup, v_sup, bias)`
    entries — query rows attend over `[own ‖ cached support]` K/V without
    a live support stream.  A cache built with batch 1 broadcasts over a
    larger query batch (one support set serving many queries).
    """
    q = split_heads(L.linear(p["to_q"], h), heads)
    k = split_heads(L.linear(p["to_k"], h), heads)
    v = split_heads(L.linear(p["to_v"], h), heads)

    if kv_iter is not None:
        k_sup, v_sup, cached_bias = next(kv_iter)
        b = h.shape[0]
        if k_sup.shape[0] != b:
            k_sup = jnp.broadcast_to(k_sup, (b,) + k_sup.shape[1:])
            v_sup = jnp.broadcast_to(v_sup, (b,) + v_sup.shape[1:])
        if cached_bias is not None and cached_bias.shape[0] != b:
            cached_bias = jnp.broadcast_to(
                cached_bias, (b,) + cached_bias.shape[1:])
        sm = shot_mask
        if sm is not None and sm.shape[0] != b:
            sm = jnp.broadcast_to(sm, (b,) + sm.shape[1:])
        out = fused_kv_attention(
            q, k, v, k_sup, v_sup, shot_mask=sm,
            support_bias=cached_bias, impl=attn_impl,
        )
    elif ref_rows is None:
        out = fused_kv_attention(q, k, v, None, None, impl=attn_impl)
    else:
        r = ref_rows
        b = h.shape[0] - r
        s = h.shape[1]
        hd = q.shape[-1]
        # Support rows: plain self-attention (the reference's ref pass also
        # attends only over its own tokens while storing K/V).
        out_ref = fused_kv_attention(q[:r], k[:r], v[:r], None, None, impl=attn_impl)
        # Query rows: attend over [own ‖ folded support] K/V.
        k_sup = k[:r].reshape(b, n_shots, s, heads, hd)
        v_sup = v[:r].reshape(b, n_shots, s, heads, hd)
        if kv_capture is not None:
            kv_capture.append((k_sup, v_sup, sup_bias))
        if shot_axis is not None:
            # shots sharded over a mesh axis: exact partial-softmax merge
            out_tag = shot_parallel_fused_kv_attention(
                q[r:], k[r:], v[r:], k_sup, v_sup, axis_name=shot_axis,
                shot_mask=shot_mask, support_bias=sup_bias, impl=attn_impl,
            )
        else:
            out_tag = fused_kv_attention(
                q[r:], k[r:], v[r:], k_sup, v_sup,
                shot_mask=shot_mask, support_bias=sup_bias, impl=attn_impl,
            )
        out = jnp.concatenate([out_ref, out_tag], axis=0)

    return L.linear(p["to_out"]["0"], merge_heads(out))


def _attn2(p, h, ctx, *, heads):
    """Cross-attention onto the (tiny) text-context sequence."""
    q = split_heads(L.linear(p["to_q"], h), heads)
    k = split_heads(L.linear(p["to_k"], ctx), heads)
    v = split_heads(L.linear(p["to_v"], ctx), heads)
    out = cross_attention(q, k, v)
    return L.linear(p["to_out"]["0"], merge_heads(out))


def _basic_transformer_block(p, h, ctx, *, heads, stream_info, attn_impl):
    (ref_rows, n_shots, shot_mask, sup_bias, shot_axis,
     kv_capture, kv_iter) = stream_info
    h = h + _attn1(
        p["attn1"], L.layer_norm(p["norm1"], h),
        heads=heads, ref_rows=ref_rows, n_shots=n_shots,
        shot_mask=shot_mask, attn_impl=attn_impl, sup_bias=sup_bias,
        shot_axis=shot_axis, kv_capture=kv_capture, kv_iter=kv_iter,
    )
    h = h + _attn2(p["attn2"], L.layer_norm(p["norm2"], h), ctx, heads=heads)
    h = h + L.geglu_ff(p["ff"], L.layer_norm(p["norm3"], h))
    return h


def _transformer2d(p, x, ctx, *, heads, cfg: UNetConfig, stream_info, attn_impl):
    b, hh, ww, c = x.shape
    residual = x
    h = L.group_norm(p["norm"], x, groups=cfg.norm_num_groups, eps=ATTN_EPS)
    h = h.reshape(b, hh * ww, c)
    if cfg.use_linear_projection:
        h = L.linear(p["proj_in"], h)
    else:
        h = L.conv2d(p["proj_in"], h.reshape(b, hh, ww, c), padding=0).reshape(b, hh * ww, c)
    for i in range(cfg.transformer_layers_per_block):
        h = _basic_transformer_block(
            p["transformer_blocks"][str(i)], h, ctx,
            heads=heads, stream_info=stream_info, attn_impl=attn_impl,
        )
    if cfg.use_linear_projection:
        h = L.linear(p["proj_out"], h)
        h = h.reshape(b, hh, ww, c)
    else:
        h = L.conv2d(p["proj_out"], h.reshape(b, hh, ww, c), padding=0)
    return h + residual


# ---------------------------------------------------------------------------
# UNet forward
# ---------------------------------------------------------------------------


def forward(
    params,
    cfg: UNetConfig,
    sample: jax.Array,
    timestep,
    context: jax.Array,
    *,
    ref_sample: Optional[jax.Array] = None,
    ref_context: Optional[jax.Array] = None,
    shot_mask: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    remat: bool = False,
    shot_axis: Optional[str] = None,
    kv_capture: Optional[list] = None,
    kv_cache=None,
) -> jax.Array:
    """Joint support+query UNet forward.

    Args:
      sample: (B, H, W, in_channels) query latents.
      timestep: scalar (or (B,)) diffusion timestep.
      context: (B, L, cross_dim) text conditioning for the query rows.
      ref_sample: optional (B, N, H, W, ref_in_channels) support latents
        (support RGB latent ‖ support mask latent on channels).
      ref_context: (B, N, L, cross_dim) or None (defaults to `context`
        broadcast over shots — the reference repeats the same empty-prompt
        embedding, `marigold_pipeline_rgb_latent_noise.py:694-696`).
      shot_mask: optional (B, N) bool validity mask for padded shots.
      ref_mask: optional (B, N, Hm, Wm) binary support masks — enables the
        experimental ATTN-MASK conditioning variant
        (`diffews/models/unet_2d_condition_attn.py` +
        `attention_processor_attnmask.py`): `ref_sample` then carries only
        the 4-channel support RGB latent through the shared `conv_in`, and
        each self-attention biases the support keys by `(1-mask)*-1e4` with
        the mask nearest-resized to that level's token grid
        (`attention_processor_attnmask.py:213-219,243-244`; level scale
        mapping down[0,1,2]/mid 3/up[2,1,0],
        `unet_2d_condition_attn.py:645-666`).
      attn_impl: "xla" | "pallas" for the fused self-attention.
      remat: checkpoint each block (training memory saver).
      shot_axis: optional mesh-axis name — call under `shard_map` with the
        SHOTS sharded over that axis (`ref_sample`/`ref_context`/
        `shot_mask`/`ref_mask` carry only this device's shard; `sample`,
        `context`, `timestep` replicated).  Each device runs its local
        shots' support stream plus the full (replicated) query stream;
        at every fused self-attention the query rows' softmax merges
        exactly across devices via a log-sum-exp psum
        (`ops/attention.py::shot_parallel_fused_kv_attention`), so
        episodes whose nshot·hw KV outgrows one chip serve across the
        mesh.  The reference has no equivalent (single-GPU xformers
        bank, `attention_processor.py:256-267`).  The returned query
        prediction is replicated on every device.

      kv_capture: optional trace-internal list — requires `ref_sample`;
        at every fused self-attention site the folded support-stream
        projections are appended as a `(k_sup, v_sup, bias)` tuple
        ((B, N, S, H, D) each; bias is the attn-mask variant's per-level
        key bias or None).  The caller packages the list into the jitted
        program's outputs — this is the SUPPORT-KV CACHE build for
        repeated-support serving, the functional equivalent of the
        reference's persistent `k_bank`/`v_bank` mutation
        (`attention_processor.py:251-261`), which the reference throws
        away after every episode.
      kv_cache: optional sequence of `(k_sup, v_sup, bias)` entries from a
        prior kv_capture run, consumed in forward order; `ref_sample` must
        be None.  The query stream runs alone and every self-attention
        fuses the cached support K/V — ~half the UNet work and no support
        VAE encodes for workloads that reuse one support set across many
        queries.  A cache built with batch 1 broadcasts over any query
        batch.  `shot_mask` applies to the cached shots.

    Returns: (B, H, W, out_channels) prediction for the query rows.
    """
    if kv_cache is not None and ref_sample is not None:
        raise ValueError("kv_cache replaces the support stream; "
                         "pass either kv_cache or ref_sample, not both")
    if kv_capture is not None and ref_sample is None:
        raise ValueError("kv_capture requires ref_sample (a live support "
                         "stream to capture)")
    if shot_axis is not None and (kv_capture is not None or
                                  kv_cache is not None):
        raise ValueError("the support-KV cache does not compose with "
                         "shot-parallel serving (a shard's cache would skip "
                         "the cross-device softmax merge)")
    if remat and (kv_capture is not None or kv_cache is not None):
        # jax.checkpoint re-traces each layer for the backward pass, which
        # would re-consume the cache iterator / leak captured tracers.
        raise ValueError("kv_capture/kv_cache are serving features and do "
                         "not compose with remat")
    kv_iter = iter(kv_cache) if kv_cache is not None else None
    b = sample.shape[0]
    if ref_sample is not None:
        n_shots = ref_sample.shape[1]
        ref_rows = b * n_shots
        ref_flat = ref_sample.reshape((ref_rows,) + ref_sample.shape[2:])
    else:
        n_shots, ref_rows, ref_flat = 0, None, None

    # --- time embedding (shared across both streams) ---
    ts = jnp.asarray(timestep, dtype=jnp.float32).reshape(-1)
    t_emb = L.timestep_embedding(
        ts, cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        downscale_freq_shift=cfg.freq_shift,
        dtype=sample.dtype,
    )
    emb1 = L.time_embedding_mlp(params["time_embedding"], t_emb)  # (1|B, D)
    total_rows = b + (ref_rows or 0)
    if emb1.shape[0] == 1:
        emb = jnp.broadcast_to(emb1, (total_rows, emb1.shape[1]))
    else:
        reps = [jnp.repeat(emb1, n_shots, axis=0)] if ref_rows else []
        emb = jnp.concatenate(reps + [emb1], axis=0)

    # --- context for the combined batch ---
    if ref_rows:
        if ref_context is None:
            ctx_ref = jnp.repeat(context, n_shots, axis=0)
        else:
            ctx_ref = ref_context.reshape((ref_rows,) + ref_context.shape[2:])
        ctx = jnp.concatenate([ctx_ref, context], axis=0)
    else:
        ctx = context

    # --- input convs: per-stream, then concat along batch ---
    h_tag = L.conv2d(params["conv_in"], sample)
    if ref_rows:
        if ref_mask is not None:
            # attn-mask variant: support stream shares the 4-ch conv_in
            h_ref = L.conv2d(params["conv_in"], ref_flat)
        else:
            h_ref = L.conv2d(params["conv_in_ref"], ref_flat)
        h = jnp.concatenate([h_ref, h_tag], axis=0)
    else:
        h = h_tag

    # --- attn-mask variant: per-scale support-key biases ---
    sup_biases = {}
    if ref_rows and ref_mask is not None:
        from diffews_tpu.ops.resize import nearest_resize

        s_lat_h, s_lat_w = sample.shape[1], sample.shape[2]
        flat_mask = ref_mask.reshape((ref_rows,) + ref_mask.shape[2:])
        for sid in range(cfg.num_levels):
            gh, gw = s_lat_h // (2**sid), s_lat_w // (2**sid)
            m = nearest_resize(flat_mask.astype(jnp.float32), (gh, gw))
            m = m.reshape(b, n_shots * gh * gw)
            sup_biases[sid] = (1.0 - m) * -10000.0

    def stream_at(sid):
        return (ref_rows, n_shots, shot_mask, sup_biases.get(sid), shot_axis,
                kv_capture, kv_iter)
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    n_levels = cfg.num_levels

    def maybe_ckpt(fn):
        return jax.checkpoint(fn) if remat else fn

    resnet = partial(L.resnet_block, groups=g, eps=eps)

    # --- down path ---
    down_states = [h]
    for i in range(n_levels):
        blk = params["down_blocks"][str(i)]
        with_attn = cfg.down_block_types[i] == "CrossAttnDownBlock2D"
        heads = cfg.num_attention_heads[i]
        for j in range(cfg.layers_per_block):

            def down_layer(h, emb, ctx, blk=blk, j=j, with_attn=with_attn,
                           heads=heads, sid=i):
                h = resnet(blk["resnets"][str(j)], h, emb)
                if with_attn:
                    h = _transformer2d(
                        blk["attentions"][str(j)], h, ctx,
                        heads=heads, cfg=cfg, stream_info=stream_at(sid),
                        attn_impl=attn_impl,
                    )
                return h

            h = maybe_ckpt(down_layer)(h, emb, ctx)
            down_states.append(h)
        if i < n_levels - 1:
            h = L.downsample2d(blk["downsamplers"]["0"], h)
            down_states.append(h)

    # --- mid ---
    def mid(h, emb, ctx):
        p = params["mid_block"]
        h = resnet(p["resnets"]["0"], h, emb)
        h = _transformer2d(
            p["attentions"]["0"], h, ctx,
            heads=cfg.num_attention_heads[-1], cfg=cfg,
            stream_info=stream_at(cfg.num_levels - 1), attn_impl=attn_impl,
        )
        h = resnet(p["resnets"]["1"], h, emb)
        return h

    h = maybe_ckpt(mid)(h, emb, ctx)

    # --- up path ---
    for i in range(n_levels):
        blk = params["up_blocks"][str(i)]
        with_attn = cfg.up_block_types[i] == "CrossAttnUpBlock2D"
        heads = cfg.num_attention_heads[n_levels - 1 - i]
        for j in range(cfg.layers_per_block + 1):
            skip = down_states.pop()

            def up_layer(h, skip, emb, ctx, blk=blk, j=j, with_attn=with_attn,
                         heads=heads, sid=n_levels - 1 - i):
                h = jnp.concatenate([h, skip], axis=-1)
                h = resnet(blk["resnets"][str(j)], h, emb)
                if with_attn:
                    h = _transformer2d(
                        blk["attentions"][str(j)], h, ctx,
                        heads=heads, cfg=cfg, stream_info=stream_at(sid),
                        attn_impl=attn_impl,
                    )
                return h

            h = maybe_ckpt(up_layer)(h, skip, emb, ctx)
        if i < n_levels - 1:
            h = L.upsample2d(blk["upsamplers"]["0"], h)

    if kv_iter is not None and next(kv_iter, None) is not None:
        raise ValueError("kv_cache has more entries than this config's "
                         "fused self-attention sites")

    # --- output head: query rows only (support head is dead compute) ---
    if ref_rows:
        h = h[ref_rows:]
    h = L.group_norm(params["conv_norm_out"], h, groups=g, eps=eps)
    h = L.silu(h)
    return L.conv2d(params["conv_out"], h)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _resnet_params(r: I.RngStream, cin: int, cout: int, temb_dim: int) -> dict:
    p = {
        "norm1": I.norm_params(cin),
        "conv1": I.conv_params(r(), 3, 3, cin, cout),
        "time_emb_proj": I.linear_params(r(), temb_dim, cout),
        "norm2": I.norm_params(cout),
        "conv2": I.conv_params(r(), 3, 3, cout, cout),
    }
    if cin != cout:
        p["conv_shortcut"] = I.conv_params(r(), 1, 1, cin, cout)
    return p


def _attn_params(r: I.RngStream, q_dim: int, kv_dim: int) -> dict:
    return {
        "to_q": I.linear_params(r(), q_dim, q_dim, bias=False),
        "to_k": I.linear_params(r(), kv_dim, q_dim, bias=False),
        "to_v": I.linear_params(r(), kv_dim, q_dim, bias=False),
        "to_out": {"0": I.linear_params(r(), q_dim, q_dim)},
    }


def _transformer_params(r: I.RngStream, c: int, cfg: UNetConfig) -> dict:
    blocks = {}
    for i in range(cfg.transformer_layers_per_block):
        blocks[str(i)] = {
            "norm1": I.norm_params(c),
            "attn1": _attn_params(r, c, c),
            "norm2": I.norm_params(c),
            "attn2": _attn_params(r, c, cfg.cross_attention_dim),
            "norm3": I.norm_params(c),
            "ff": {
                "net": {
                    "0": {"proj": I.linear_params(r(), c, c * 8)},
                    "2": I.linear_params(r(), c * 4, c),
                }
            },
        }
    if cfg.use_linear_projection:
        proj_in = I.linear_params(r(), c, c)
        proj_out = I.linear_params(r(), c, c)
    else:
        proj_in = I.conv_params(r(), 1, 1, c, c)
        proj_out = I.conv_params(r(), 1, 1, c, c)
    return {
        "norm": I.norm_params(c),
        "proj_in": proj_in,
        "transformer_blocks": blocks,
        "proj_out": proj_out,
    }


def init_params(rng, cfg: UNetConfig) -> dict:
    r = I.RngStream(rng)
    chans = cfg.block_out_channels
    n = cfg.num_levels
    temb_dim = cfg.time_embed_dim

    params = {
        "conv_in": I.conv_params(r(), cfg.conv_in_kernel, cfg.conv_in_kernel,
                                 cfg.in_channels, chans[0]),
        "conv_in_ref": I.conv_params(r(), cfg.conv_in_kernel, cfg.conv_in_kernel,
                                     cfg.ref_in_channels, chans[0]),
        "time_embedding": {
            "linear_1": I.linear_params(r(), chans[0], temb_dim),
            "linear_2": I.linear_params(r(), temb_dim, temb_dim),
        },
    }

    down = {}
    cin = chans[0]
    down_out_channels = [chans[0]]  # skip channel bookkeeping, mirrors forward
    for i in range(n):
        cout = chans[i]
        blk = {"resnets": {}, "attentions": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _resnet_params(r, cin if j == 0 else cout, cout, temb_dim)
            if cfg.down_block_types[i] == "CrossAttnDownBlock2D":
                blk["attentions"][str(j)] = _transformer_params(r, cout, cfg)
            down_out_channels.append(cout)
        if not blk["attentions"]:
            del blk["attentions"]
        if i < n - 1:
            blk["downsamplers"] = {"0": {"conv": I.conv_params(r(), 3, 3, cout, cout)}}
            down_out_channels.append(cout)
        down[str(i)] = blk
        cin = cout
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnets": {
            "0": _resnet_params(r, chans[-1], chans[-1], temb_dim),
            "1": _resnet_params(r, chans[-1], chans[-1], temb_dim),
        },
        "attentions": {"0": _transformer_params(r, chans[-1], cfg)},
    }

    up = {}
    rev = list(reversed(chans))
    cin = rev[0]
    for i in range(n):
        cout = rev[i]
        blk = {"resnets": {}, "attentions": {}}
        for j in range(cfg.layers_per_block + 1):
            skip_ch = down_out_channels.pop()
            blk["resnets"][str(j)] = _resnet_params(
                r, (cin if j == 0 else cout) + skip_ch, cout, temb_dim
            )
            if cfg.up_block_types[i] == "CrossAttnUpBlock2D":
                blk["attentions"][str(j)] = _transformer_params(r, cout, cfg)
        if not blk["attentions"]:
            del blk["attentions"]
        if i < n - 1:
            blk["upsamplers"] = {"0": {"conv": I.conv_params(r(), 3, 3, cout, cout)}}
        up[str(i)] = blk
        cin = cout
    params["up_blocks"] = up

    params["conv_norm_out"] = I.norm_params(chans[0])
    params["conv_out"] = I.conv_params(r(), cfg.conv_out_kernel, cfg.conv_out_kernel,
                                       chans[0], cfg.out_channels)
    return params
