"""One-step few-shot segmentation inference pipeline (TPU-native).

Re-design of `MarigoldPipelineRGBLatentNoise`
(`diffews/marigold_pipeline_rgb_latent_noise.py:99-944`).  The reference
orchestrates, per episode: 3 separate VAE encodes, a CLIP empty-prompt
encode, per-step double UNet dispatch with bank clears, a scheduler step,
VAE decode and a host-side PIL postprocess.  Here the entire episode
compiles to ONE XLA program:

  - query, supports and support-masks are VAE-encoded in a single batched
    call (B*(1+2N) images) instead of three;
  - the UNet runs the joint support+query forward (`diffews_tpu.models.unet`);
  - the degenerate scheduler folds to `x0 = -v` at compile time;
  - decode + clip + [0,255] quantization stay on device; the uint8
    round-trip and relative threshold reproduce the reference's PIL path
    bit-exactly (`main_oss.py:128-137`, pipeline `:784-802,532-545`).

The reference's per-query CLIP image preprocessing (pipeline `:313-325`) is
dead compute for segmentation and is dropped.  `ensemble_size` is accepted
for CLI parity: seg inference is deterministic (no noise enters the graph),
so the ensemble mean of identical predictions equals a single prediction
(`:468`); we compute once.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffews_tpu import checkpoint as ckpt_lib
from diffews_tpu.configs import SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import clip_text, unet, vae
from diffews_tpu.ops.resize import nearest_resize
from diffews_tpu.scheduler import DDIMScheduler


@dataclasses.dataclass
class SegOutput:
    """Counterpart of `MarigoldSegOutput` (pipeline `:66-80`)."""

    seg_colored: np.ndarray  # (B, H, W, 3) uint8
    mask: Optional[np.ndarray] = None  # (B, H, W) bool, if thresholding requested
    uncertainty: Optional[np.ndarray] = None


@dataclasses.dataclass
class SupportCache:
    """Precomputed support-set state for repeated-support serving.

    The reference recomputes the support ("reference") UNet pass and the
    support/mask VAE encodes for EVERY query even when the support set is
    fixed (`marigold_pipeline_rgb_latent_noise.py:649-651,719-720` runs per
    episode; the k/v bank is cleared after each step, `:715,725`).  This
    caches that work once: per-attention-site folded support K/V plus the
    shot validity mask, so each query pays only its own VAE encode, a
    query-only UNet stream and the decode.

    Built by `DiffewsPipeline.precompute_supports`; consumed by
    `predict_cached` / `predict_cached_async`.  A cache built with batch 1
    serves any query batch (the K/V broadcast).  Entries live on device.
    """

    entries: tuple  # per-site (k_sup, v_sup, bias-or-None) device arrays
    shot_mask: Optional[jax.Array]  # (B, N) bool or None
    n_shots: int
    batch: int


@dataclasses.dataclass
class DepthOutput:
    """Counterpart of `MarigoldDepthOutput` (pipeline `:44-63`)."""

    depth_np: np.ndarray  # (B, H, W) float32 in [0, 1]
    depth_colored: Optional[np.ndarray] = None  # (B, H, W, 3) uint8
    uncertainty: Optional[np.ndarray] = None


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


class DiffewsPipeline:
    """Few-shot segmentation predictor.

    Args:
      bundle: `checkpoint.PipelineBundle` with params/configs.
      compute_dtype: jnp.float32 (parity) or jnp.bfloat16 (TPU speed).
      attn_impl: "auto" (pallas flash kernel on TPU, dense XLA elsewhere),
        "xla", or "pallas".
      test_timestep: timestep multiplier (`main_oss.py --test_timestep`).
    """

    def __init__(
        self,
        bundle: ckpt_lib.PipelineBundle,
        *,
        compute_dtype=jnp.float32,
        attn_impl: str = "auto",
        test_timestep: int = 1,
        mesh=None,
        shot_mesh=None,
        encode_chunks: int = 0,
        vae_impl: str = "xla",
        unet_int8: bool = False,
        attn_mask_variant: bool = False,
    ):
        """mesh: optional `jax.sharding.Mesh` with a "data" axis — episode
        batches shard across chips and params replicate (multi-chip serving;
        the reference evaluates on one GPU, `main_oss.py:308`).  Batch size
        must divide the data-axis size.

        encode_chunks: run the batched VAE encode as a `lax.map` over this
        many equal chunks instead of one flat batch.  Numerics are
        unchanged (images are independent through the VAE); the HLO shrinks
        roughly encode_chunks-fold on the encode section, which cuts the
        remote-compile cost of very large episode graphs (5-shot b8 = 88
        encoded images crashes the compile helper as one flat batch).
        0 (default) = AUTO: one flat batch up to 48 encoded images (the
        chip saturates by ~24, 44 images — 5-shot b4 — compiles fine and
        flat beats 2x22 there), else chunks of <=24 images (measured:
        4x22 runs 2.2x the 2x44 split at 5-shot b8 and makes b8 the best
        5-shot operating point — tools/tpu_5shot_sweep.py).  Counts that
        don't divide evenly are zero-padded and the pad latents sliced
        off — bit-identical for the real images.

        vae_impl: resnet implementation for the VAE ("xla" | "fused" |
        "mixed" | "auto" | "int8").  Default "xla" keeps eval numerics
        independent of --bsz: the fused Pallas chain's GroupNorm (sum/sumsq
        affine) rounds differently from XLA, so auto-switching on batch size
        would make metrics batch-dependent on TPU.  "auto" opts into the
        measured small-batch heuristic (fused when the encode batch is <= 4
        images on TPU: b3 encode 55.9 vs 74.6 ms on 1x v5e) at the cost of
        that invariance; "fused"/"mixed" force a fixed choice
        (batch-invariant again, different rounding than "xla").  "int8"
        quantizes the VAE's 3x3 convs to W8A8 for the MXU's 2x int8 rate
        (measured 1.32-1.40x per conv incl. scale chains,
        `ops/quant.py`) — an accuracy-affecting OPT-IN that the reference
        has no equivalent of; the headline protocol stays bf16.

        attn_mask_variant: the reference's experimental ATTN-MASK
        conditioning (`diffews/models/unet_2d_condition_attn.py` +
        `attention_processor_attnmask.py`): support masks condition via
        per-level attention KEY BIASES instead of a VAE-encoded latent
        channel — only query+support RGB are VAE-encoded, the support
        stream shares the 4-ch `conv_in` (no `conv_in_ref`), and each
        self-attention biases masked-out support keys by -1e4.  Must
        match the checkpoint's training mode."""
        self.unet_cfg: UNetConfig = bundle.unet_cfg
        self.vae_cfg: VAEConfig = bundle.vae_cfg
        self.scheduler = DDIMScheduler(bundle.scheduler_cfg)
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        self.test_timestep = test_timestep
        self.encode_chunks = int(encode_chunks)
        self.vae_impl = vae_impl
        self.attn_mask_variant = bool(attn_mask_variant)

        # device_put AFTER the cast (host numpy casts are free and halve
        # the upload): bundle trees loaded from checkpoints (or
        # device_get'd by callers) are HOST numpy, and numpy.astype keeps
        # them host-side (ml_dtypes numpy bf16) — without an explicit put,
        # every pipeline call re-uploads the full ~1.7 GB tree as a jit
        # argument (observed on the axon tunnel: ~50-100 s/batch instead
        # of ~0.4 s, plus unbounded host staging growth).  When a mesh /
        # shot_mesh is given, SKIP this default-device put: those branches
        # below do the only put, host-numpy-to-replicated-sharding (the
        # well-supported transfer path) — a pre-put here would stage a
        # transient second full copy of the tree on the default device.
        self.unet_params = _cast_tree(bundle.unet_params, compute_dtype)
        self.vae_params = _cast_tree(bundle.vae_params, compute_dtype)
        if mesh is None and shot_mesh is None:
            self.unet_params = jax.device_put(self.unet_params)
            self.vae_params = jax.device_put(self.vae_params)
        if vae_impl == "int8":
            from diffews_tpu.ops import quant

            # Calibrate STATIC per-site activation scales on a small
            # synthetic batch: with a static scale the s8 quantize fuses
            # into the producing GN/SiLU epilogue, where a dynamic amax
            # serializes an extra HBM pass per conv that eats half the MXU
            # win (measured: bf16 19.5 / int8-dynamic 20.5 / int8-static
            # 22.4 q/s at the b8 episode — ops/quant.py, PERF.md).
            scales = quant.calibrate_vae_scales(
                self.vae_params, self.vae_cfg, attn_impl=self.attn_impl,
                dtype=compute_dtype)
            # the int8-ness lives in the param tree (layers.conv2d routes on
            # "kernel_q"); the resnet graph itself runs the "xla" path
            self.vae_params = quant.quantize_conv_tree(
                self.vae_params, a_scales=scales)
        self.mesh = mesh
        self.shot_mesh = shot_mesh
        if mesh is not None and shot_mesh is not None:
            raise ValueError(
                "pass either mesh (episode data-parallel) or shot_mesh; to "
                'compose them, give shot_mesh a 2-D ("data", "shots") mesh '
                "(parallel.mesh.make_shot_mesh(n_shards, n_data=...))")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), t)
            self.unet_params = put(self.unet_params)
            self.vae_params = put(self.vae_params)
            self._batch_sharding = NamedSharding(mesh, P("data"))
        else:
            self._batch_sharding = None

        # Empty-prompt embedding: computed once, like the reference caches
        # `empty_text_embed` (pipeline `:585-614`).  Eval protocol uses the
        # unpadded [bos, eos] ids (seq len 2).
        if bundle.text_params is not None:
            ids = clip_text.empty_prompt_ids(bundle.text_cfg)
            emb = clip_text.forward(bundle.text_params, bundle.text_cfg, ids)
            self.empty_text_embed = jnp.asarray(emb, dtype=compute_dtype)
        else:
            self.empty_text_embed = jnp.zeros(
                (1, 2, self.unet_cfg.cross_attention_dim), dtype=compute_dtype
            )

        if unet_int8:
            # Opt-in W8A8 UNet attention/FFN linears (attn1 q/k/v/out,
            # GEGLU ff, transformer proj_in/out — `quant.
            # unet_attention_linear`): same calibrated-static-scale scheme
            # as the int8 VAE; cross-attention and convs stay fp.
            # Accuracy-affecting, off by default; the headline stays bf16.
            from diffews_tpu.ops import quant

            rng = np.random.default_rng(0)
            lh = 32  # ~ a 256px episode's latent grid; GN'd token stats
            lat = jnp.asarray(rng.normal(size=(1, lh, lh, 4)), compute_dtype)
            ref = jnp.asarray(rng.normal(size=(1, 1, lh, lh, 8)),
                              compute_dtype)

            def calib_run(p, lat, ref, ctx):
                return unet.forward(p, self.unet_cfg, lat, 1, ctx,
                                    ref_sample=ref, attn_impl=self.attn_impl)

            tagged = quant.tag_linear_sites(self.unet_params)
            scales = quant.calibrate_conv_scales(
                calib_run, tagged, lat, ref, self.empty_text_embed)
            self.unet_params = quant.quantize_linear_tree(
                self.unet_params, a_scales=scales)

        if shot_mesh is not None:
            # Shot-parallel serving: the episode's SHOTS shard over the
            # mesh's "shots" axis — each chip encodes + runs the support
            # stream for its local shots only, the query stream is
            # replicated, and every fused self-attention merges partial
            # softmaxes exactly across chips (one pmax + two q-sized psum
            # per layer; `ops/attention.py::shot_parallel_fused_kv_attention`).
            # Serves episodes whose nshot·hw KV footprint outgrows one chip;
            # the reference's equivalent does not exist (single-GPU xformers
            # bank, `attention_processor.py:256-267`).
            #
            # A 2-D ("data", "shots") mesh composes this with episode-batch
            # data parallelism (the axes are independent: batch rows shard
            # over "data", each data-group's shots shard over "shots", and
            # the softmax-merge psum rides only the "shots" axis).
            from jax.experimental.shard_map import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            if "shots" not in shot_mesh.axis_names:
                raise ValueError('shot_mesh must have a "shots" axis')
            has_data = "data" in shot_mesh.axis_names
            d_ax = "data" if has_data else None
            rep = NamedSharding(shot_mesh, P())
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), t)
            self.unet_params = put(self.unet_params)
            self.vae_params = put(self.vae_params)
            n_sh = shot_mesh.shape["shots"]
            n_dp = shot_mesh.shape.get("data", 1)

            def _sharded(impl, unet_params, vae_params, query, supports,
                         masks, text_embed, shot_mask, denoising_steps):
                if supports.shape[1] % n_sh:
                    raise ValueError(
                        f"the shots axis ({n_sh}) must divide n-shot "
                        f"{supports.shape[1]}; pad with shot_mask")
                if supports.shape[0] % n_dp:
                    raise ValueError(
                        f"the data axis ({n_dp}) must divide the episode "
                        f"batch {supports.shape[0]}")
                if shot_mask is None:
                    shot_mask = jnp.ones(supports.shape[:2], bool)
                f = partial(impl, unet_params, vae_params,
                            denoising_steps=denoising_steps,
                            shot_axis="shots")
                return shard_map(
                    f, mesh=shot_mesh,
                    in_specs=(P(d_ax), P(d_ax, "shots"), P(d_ax, "shots"),
                              P(), P(d_ax, "shots")),
                    out_specs=P(d_ax), check_rep=False,
                )(query, supports, masks, text_embed, shot_mask)

            self._predict_jit = jax.jit(
                partial(_sharded, self._predict_impl),
                static_argnames=("denoising_steps",))
            self._predict_depth_jit = jax.jit(
                partial(_sharded, self._predict_depth_impl),
                static_argnames=("denoising_steps",))
        else:
            self._predict_jit = jax.jit(
                self._predict_impl, static_argnames=("denoising_steps",)
            )
            self._predict_depth_jit = jax.jit(
                self._predict_depth_impl, static_argnames=("denoising_steps",)
            )
        self._capture_jit = jax.jit(self._capture_impl)
        self._predict_cached_jit = jax.jit(self._predict_cached_impl)

    @classmethod
    def from_pretrained(
        cls,
        checkpoint: str,
        unet_dir: Optional[str] = None,
        scheduler_dir: Optional[str] = None,
        **kw,
    ) -> "DiffewsPipeline":
        bundle = ckpt_lib.load_pipeline_bundle(checkpoint, unet_dir, scheduler_dir)
        return cls(bundle, **kw)

    # -- core jitted graph --------------------------------------------------

    def _norm_img(self, x):
        """In-graph uint8 ingestion: replay the host transform's exact f32
        `/255, -0.5, /0.5` arithmetic (transforms.ImageTransform) so raw
        uint8 uploads are bit-identical to host-normalized floats."""
        if x.dtype == jnp.uint8:
            x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        return x.astype(self.compute_dtype)

    def _norm_mask(self, masks):
        """(B, N, H, W) {0,1} -> (B, N, H, W, 3) in [-1, 1] (the harness's
        mask folding, `main_oss.py:100-104`); 5-D inputs pass through the
        image normalization."""
        if masks.ndim == 4:
            m = masks.astype(jnp.float32) * 2.0 - 1.0
            return jnp.broadcast_to(
                m[..., None], m.shape + (3,)).astype(self.compute_dtype)
        return self._norm_img(masks)

    def _encode_images(self, vae_params, all_imgs):
        """Batched VAE mean-latent encode with the configured resnet impl
        and the (auto-)chunked `lax.map` split for very large batches (see
        __init__'s encode_chunks doc — numerics are unchanged, images are
        independent through the VAE)."""
        if self.vae_impl == "auto":
            # opt-in heuristic: small encode batches can't saturate XLA's
            # spatially-partitioned convs; the fused Pallas resnet chain wins
            # there (1x v5e: b3 encode 55.9 vs 74.6 ms) but loses once the
            # chip saturates (b24: 226 vs 181 ms) —
            # tools/tpu_fused_resnet_bench.py.  Rounding differs between the
            # two paths, hence not the default (see __init__).
            resnet_impl = ("fused" if all_imgs.shape[0] <= 4
                           and jax.default_backend() == "tpu" else "xla")
        elif self.vae_impl == "int8":
            # quantization lives in the param tree; the graph is "xla"
            resnet_impl = "xla"
        else:
            resnet_impl = self.vae_impl
        enc = lambda imgs: vae.encode_mean_latent(
            vae_params, self.vae_cfg, imgs,
            attn_impl=self.attn_impl, resnet_impl=resnet_impl)
        nimg = all_imgs.shape[0]
        chunks = self.encode_chunks
        if chunks == 0:  # auto (see __init__ docstring)
            # flat up to 48 images; past that, chunks of <=24.  Measured
            # same-session on 1x v5e (tools/tpu_5shot_sweep.py, device-only
            # timing): 5-shot b8 (88 imgs) runs 3.92 q/s at 4x22 vs 1.81 at
            # 2x44 and 2.72 at 8x11 — mid-sized lax.map chunks at the ~24-
            # image saturation point beat both the huge-chunk split and
            # under-saturated small chunks; flat 44 at b4 (3.81) still
            # beats 2x22 (3.19), so chunking only starts past 48.
            chunks = 1 if nimg <= 48 else -(-nimg // 24)
        if chunks > 1:
            # Non-dividing counts pad with zero images and slice the pad
            # latents off (images are independent through the VAE, so the
            # real latents are bit-identical) — without this, a prime image
            # count would degrade to per-image lax.map encodes (~2.5x the
            # batched per-image cost, PERF.md).
            per = -(-nimg // chunks)
            pad = chunks * per - nimg
            padded = (jnp.concatenate(
                [all_imgs,
                 jnp.zeros((pad,) + all_imgs.shape[1:], all_imgs.dtype)])
                if pad else all_imgs)
            chunked = padded.reshape((chunks, per) + all_imgs.shape[1:])
            lat = jax.lax.map(enc, chunked)
            return lat.reshape((chunks * per,) + lat.shape[2:])[:nimg]
        return enc(all_imgs)

    def _x0_latent(
        self,
        unet_params,
        vae_params,
        query: jax.Array,       # (B, H, W, 3) in [-1, 1]
        supports: jax.Array,    # (B, N, H, W, 3) in [-1, 1]
        masks: jax.Array,       # (B, N, H, W, 3) in [-1, 1]
        text_embed: jax.Array,  # (1, L, D)
        shot_mask: Optional[jax.Array],
        denoising_steps: int,
        shot_axis: Optional[str] = None,
    ) -> jax.Array:
        """Predicted x0 latent for the episode (shared by seg/depth heads)."""
        b, n = supports.shape[0], supports.shape[1]
        dt = self.compute_dtype

        # ---- in-graph ingestion (uint8 fast path) ----
        # Accepting raw uint8 images and (B,N,H,W) {0,1} masks cuts the
        # host->device upload ~8x per episode (bench: uint8 15 MB vs f32
        # 125 MB at b8 512px 1-shot); normalization replays the host
        # transform's exact f32 arithmetic so numerics are unchanged.
        query, supports = self._norm_img(query), self._norm_img(supports)
        masks = self._norm_mask(masks)

        if self.attn_mask_variant:
            # ATTN-MASK variant: the support mask becomes per-level
            # attention key biases inside the UNet (`unet.forward`
            # `ref_mask`), not a latent channel — only query+support RGB
            # go through the VAE and the support stream shares `conv_in`
            # (`attention_processor_attnmask.py:213-244`,
            # `unet_2d_condition_attn.py:645-666`).
            ref_mask = (masks.astype(jnp.float32).mean(axis=-1) > 0.0
                        ).astype(jnp.float32)  # (B, N, H, W) {0,1}
            all_imgs = jnp.concatenate(
                [query, supports.reshape((b * n,) + supports.shape[2:])],
                axis=0,
            )
            lat = self._encode_images(vae_params, all_imgs)
            lh, lw = lat.shape[1:3]
            q_lat = lat[:b]
            ref = lat[b:].reshape(b, n, lh, lw, -1)  # (B, N, h, w, 4)
        else:
            ref_mask = None
            # ---- single batched VAE encode for all three streams ----
            all_imgs = jnp.concatenate(
                [
                    query,
                    supports.reshape((b * n,) + supports.shape[2:]),
                    masks.reshape((b * n,) + masks.shape[2:]),
                ],
                axis=0,
            )
            lat = self._encode_images(vae_params, all_imgs)
            lh, lw = lat.shape[1:3]
            q_lat = lat[:b]
            s_lat = lat[b : b + b * n].reshape(b, n, lh, lw, -1)
            m_lat = lat[b + b * n :].reshape(b, n, lh, lw, -1)
            ref = jnp.concatenate([s_lat, m_lat], axis=-1)  # (B, N, h, w, 8)

        ctx = jnp.broadcast_to(text_embed, (b,) + text_embed.shape[1:]).astype(dt)

        # ---- denoising loop (static, unrolled; 1 step on the DiffewS path) ----
        self.scheduler.set_timesteps(denoising_steps)
        latent = q_lat
        x0 = latent
        for t in self.scheduler.timesteps:
            v = unet.forward(
                unet_params, self.unet_cfg, latent,
                int(t) * self.test_timestep, ctx,
                ref_sample=ref, shot_mask=shot_mask, ref_mask=ref_mask,
                attn_impl=self.attn_impl, shot_axis=shot_axis,
            )
            latent, x0 = self.scheduler.step(v, int(t), latent)
        return x0

    def _decode_resnet_impl(self) -> str:
        """Resnet impl for the DECODER.  Forced "fused"/"mixed" apply to the
        whole VAE (a fixed-choice flag must not silently split impls);
        "auto"'s measured heuristic is encode-only by design — the fused
        decode loses at every batch size (b1 68 vs 52, b8 176 vs 145 ms,
        tools/tpu_fused_resnet_bench.py) — and "int8" quantization lives in
        the param tree, so both decode through XLA."""
        return self.vae_impl if self.vae_impl in ("fused", "mixed") else "xla"

    def _decode_seg(self, vae_params, x0) -> jax.Array:
        """VAE decode + seg postprocess (pipeline `:784-802,887-905`):
        clip(-1,1) -> [0,255] uint8 (the uint8 round-trip the reference
        pays through PIL, kept for bit parity with `main_oss.py:128-137`)."""
        img = vae.decode(vae_params, self.vae_cfg, x0, attn_impl=self.attn_impl,
                         resnet_impl=self._decode_resnet_impl())
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
        img = (img * 0.5 + 0.5) * 255.0
        return jnp.clip(img, 0.0, 255.0).astype(jnp.uint8)

    def _predict_impl(self, unet_params, vae_params, query, supports, masks,
                      text_embed, shot_mask, denoising_steps,
                      shot_axis=None) -> jax.Array:
        x0 = self._x0_latent(unet_params, vae_params, query, supports, masks,
                             text_embed, shot_mask, denoising_steps,
                             shot_axis)
        return self._decode_seg(vae_params, x0)

    def _capture_impl(self, unet_params, vae_params, supports, masks,
                      text_embed) -> tuple:
        """Encode a support set and capture per-site UNet support K/V.

        Runs the support stream once (joint forward with a zero dummy
        query — support rows are batch-independent of the query rows, so
        the captured K/V are identical to a full episode's) and returns
        the per-attention-site `(k_sup, v_sup, bias)` entries as jit
        outputs."""
        b, n = supports.shape[0], supports.shape[1]
        supports = self._norm_img(supports)
        masks = self._norm_mask(masks)
        if self.attn_mask_variant:
            # variant: mask -> per-level key biases (captured alongside
            # K/V as each entry's `bias` slot); only support RGB encoded
            ref_mask = (masks.astype(jnp.float32).mean(axis=-1) > 0.0
                        ).astype(jnp.float32)
            lat = self._encode_images(
                vae_params, supports.reshape((b * n,) + supports.shape[2:]))
            lh, lw = lat.shape[1:3]
            ref = lat.reshape(b, n, lh, lw, -1)
        else:
            ref_mask = None
            all_imgs = jnp.concatenate(
                [
                    supports.reshape((b * n,) + supports.shape[2:]),
                    masks.reshape((b * n,) + masks.shape[2:]),
                ],
                axis=0,
            )
            lat = self._encode_images(vae_params, all_imgs)
            lh, lw = lat.shape[1:3]
            s_lat = lat[: b * n].reshape(b, n, lh, lw, -1)
            m_lat = lat[b * n :].reshape(b, n, lh, lw, -1)
            ref = jnp.concatenate([s_lat, m_lat], axis=-1)
        ctx = jnp.broadcast_to(
            text_embed, (b,) + text_embed.shape[1:]).astype(self.compute_dtype)
        self.scheduler.set_timesteps(1)
        t = int(self.scheduler.timesteps[0]) * self.test_timestep
        dummy_q = jnp.zeros((b, lh, lw, self.unet_cfg.in_channels),
                            self.compute_dtype)
        cap: list = []
        unet.forward(
            unet_params, self.unet_cfg, dummy_q, t, ctx,
            ref_sample=ref, ref_mask=ref_mask, attn_impl=self.attn_impl,
            kv_capture=cap,
        )
        return tuple(cap)

    def _predict_cached_impl(self, unet_params, vae_params, query, entries,
                             shot_mask, text_embed) -> jax.Array:
        """Query-only episode against a precomputed support-KV cache."""
        query = self._norm_img(query)
        q_lat = self._encode_images(vae_params, query)
        b = q_lat.shape[0]
        ctx = jnp.broadcast_to(
            text_embed, (b,) + text_embed.shape[1:]).astype(self.compute_dtype)
        self.scheduler.set_timesteps(1)
        t = int(self.scheduler.timesteps[0])
        v = unet.forward(
            unet_params, self.unet_cfg, q_lat, t * self.test_timestep, ctx,
            shot_mask=shot_mask, attn_impl=self.attn_impl, kv_cache=entries,
        )
        _, x0 = self.scheduler.step(v, t, q_lat)
        return self._decode_seg(vae_params, x0)

    def _predict_depth_impl(self, unet_params, vae_params, query, supports,
                            masks, text_embed, shot_mask, denoising_steps,
                            shot_axis=None) -> jax.Array:
        """Depth head: channel-mean of the decoded latent -> clip(-1,1) ->
        [0,1] (`decode_depth` pipeline `:867-885`, postprocess `:775-781`)."""
        x0 = self._x0_latent(unet_params, vae_params, query, supports, masks,
                             text_embed, shot_mask, denoising_steps,
                             shot_axis)
        img = vae.decode(vae_params, self.vae_cfg, x0, attn_impl=self.attn_impl,
                         resnet_impl=self._decode_resnet_impl())
        depth = img.astype(jnp.float32).mean(axis=-1)  # (B, H, W)
        depth = jnp.clip(depth, -1.0, 1.0)
        return depth * 0.5 + 0.5

    # -- public API ---------------------------------------------------------

    def predict_async(
        self,
        query,
        supports,
        support_masks,
        *,
        shot_mask=None,
        denoising_steps: int = 1,
        out_size: Optional[Tuple[int, int]] = None,
        r_threshold: float = 0.0,
        threshold: float = 0.0,
        mask_on_device: bool = False,
    ) -> "PendingSeg":
        """Dispatch an episode without waiting for the device.

        mask_on_device=True additionally runs the threshold rule in-graph
        (`device_mask_from_seg`) so `.result(need_seg=False)` transfers
        the packed bool mask only (~24× fewer device→host bytes; the
        serving daemon's default masks-only responses use this).  The
        eval harness keeps the host formula (default False).

        Returns a `PendingSeg`; call `.result()` for the `SegOutput`.  JAX
        dispatch is asynchronous, so the caller can enqueue the next episode
        (or do host-side metric work) while the device computes — the eval
        harness uses this to hide the host<->device latency behind compute.
        Numerics are identical to `predict` (same program, same uint8
        round-trip; only the synchronization point moves).

        Fast ingestion: `query`/`supports` may be raw uint8 (0..255) and
        `support_masks` may be a 4-D (B, N, H, W) {0,1} array (any dtype) —
        normalization / 3-channel [-1,1] folding then happen in-graph,
        shrinking the host->device upload ~8x with bit-identical results
        (the device replays the host transform's f32 arithmetic).
        """
        query = _to_nhwc(np.asarray(query), 4)
        supports = _to_nhwc(np.asarray(supports), 5)
        support_masks = np.asarray(support_masks)
        if support_masks.ndim == 5:
            support_masks = _to_nhwc(support_masks, 5)
        elif support_masks.ndim != 4:
            raise ValueError(
                f"support_masks must be 4-D {{0,1}} or 5-D 3-channel [-1,1]; "
                f"got shape {support_masks.shape}")

        def put(x):
            x = jnp.asarray(x)
            if self._batch_sharding is not None:
                x = jax.device_put(x, self._batch_sharding)
            return x

        img = self._predict_jit(
            self.unet_params,
            self.vae_params,
            put(query),
            put(supports),
            put(support_masks),
            self.empty_text_embed,
            None if shot_mask is None else put(shot_mask),
            denoising_steps,
        )

        if out_size is not None and tuple(img.shape[1:3]) != tuple(out_size):
            img = nearest_resize(img, tuple(out_size))
        return PendingSeg(img, r_threshold, threshold,
                          mask_device=self._maybe_device_mask(
                              img, r_threshold, threshold, mask_on_device))

    @staticmethod
    def _maybe_device_mask(img, r_threshold, threshold, mask_on_device):
        if not mask_on_device or (r_threshold <= 0 and threshold <= 0):
            return None
        rel = r_threshold > 0
        return device_mask_from_seg(
            img, jnp.float32(r_threshold if rel else threshold), rel)

    def precompute_supports(
        self,
        supports,
        support_masks,
        *,
        shot_mask=None,
    ) -> SupportCache:
        """Encode a support set once for repeated-support serving.

        Returns a `SupportCache` holding the per-attention-site support K/V
        (and the shot validity mask) on device.  `predict_cached` then
        serves any number of queries against it, skipping the support VAE
        encodes and the UNet support stream every time — the dominant
        real-world serving pattern (segment a whole dataset/video with one
        annotated support set), which the reference recomputes per episode
        (`marigold_pipeline_rgb_latent_noise.py:649-651,719-720`).

        Build with batch 1 to serve arbitrary query batches (the cache
        broadcasts), or batch B to pair row-for-row with B-row query
        batches.  Accepts the same raw-uint8 / {0,1}-mask fast ingestion as
        `predict`.  Not supported under shot-parallel serving (`shot_mesh`).
        """
        if self.shot_mesh is not None:
            raise NotImplementedError(
                "support-KV caching does not compose with shot-parallel "
                "serving (the cache would skip the cross-chip softmax merge)")
        supports = _to_nhwc(np.asarray(supports), 5)
        support_masks = np.asarray(support_masks)
        if support_masks.ndim == 5:
            support_masks = _to_nhwc(support_masks, 5)
        elif support_masks.ndim != 4:
            raise ValueError(
                f"support_masks must be 4-D {{0,1}} or 5-D 3-channel [-1,1]; "
                f"got shape {support_masks.shape}")
        sup_j = jnp.asarray(supports)
        msk_j = jnp.asarray(support_masks)
        sm_j = None if shot_mask is None else jnp.asarray(shot_mask)
        if self.mesh is not None:
            # Commit the capture inputs to the episode-data mesh so the
            # cache entries GSPMD-propagate the same layout predict_cached
            # uses: a batch-1 (broadcast) cache replicates over the chips,
            # a batch-B cache shards row-for-row with the query batch.
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P("data") if supports.shape[0] > 1 else P()
            sh = NamedSharding(self.mesh, spec)
            sup_j, msk_j = jax.device_put(sup_j, sh), jax.device_put(msk_j, sh)
            if sm_j is not None:
                sm_j = jax.device_put(sm_j, sh)
        entries = self._capture_jit(
            self.unet_params, self.vae_params,
            sup_j, msk_j,
            self.empty_text_embed,
        )
        return SupportCache(
            entries=entries,
            shot_mask=sm_j,
            n_shots=supports.shape[1],
            batch=supports.shape[0],
        )

    def predict_cached_async(
        self,
        query,
        cache: SupportCache,
        *,
        denoising_steps: int = 1,
        out_size: Optional[Tuple[int, int]] = None,
        r_threshold: float = 0.0,
        threshold: float = 0.0,
        mask_on_device: bool = False,
    ) -> "PendingSeg":
        """Dispatch queries against a precomputed `SupportCache`.

        mask_on_device: as in `predict_async` — in-graph threshold, so
        masks-only consumers skip the full seg-image transfer.

        Computes the same math as `predict` with the same support set (the
        support stream is batch-independent of the query stream, so its
        K/V don't change between the capture run and a joint episode);
        the decoded uint8 image can differ by at most the quantization
        step at boundary pixels (the VAE encode runs at a different batch
        size than the joint episode's, and XLA's fusion rounding is
        batch-size-dependent — observed: <=1/3072 pixels off by 1).
        Only `denoising_steps=1` is supported — the cache is captured at
        the protocol's fixed timestep, and the DiffewS scheduler is the
        degenerate one-step DDIM (extra steps are no-ops in the reference
        too, SURVEY.md §3.5).
        """
        if denoising_steps != 1:
            raise NotImplementedError(
                "the support-KV cache is captured at the one-step protocol's "
                "fixed timestep; multi-step denoising would need a per-t "
                "cache (the reference's extra steps are identity no-ops)")
        query = _to_nhwc(np.asarray(query), 4)
        b = query.shape[0]
        if cache.batch not in (1, b):
            raise ValueError(
                f"cache batch {cache.batch} must be 1 (broadcast) or match "
                f"the query batch {b}")
        q_j = jnp.asarray(query)
        if self._batch_sharding is not None:
            # shard the query batch over the episode-data mesh (same rule
            # as predict_async; a batch-1 cache broadcasts to every chip)
            q_j = jax.device_put(q_j, self._batch_sharding)
        img = self._predict_cached_jit(
            self.unet_params,
            self.vae_params,
            q_j,
            cache.entries,
            cache.shot_mask,
            self.empty_text_embed,
        )
        if out_size is not None and tuple(img.shape[1:3]) != tuple(out_size):
            img = nearest_resize(img, tuple(out_size))
        return PendingSeg(img, r_threshold, threshold,
                          mask_device=self._maybe_device_mask(
                              img, r_threshold, threshold, mask_on_device))

    def predict_cached(self, *args, **kw) -> SegOutput:
        """Blocking form of `predict_cached_async`."""
        return self.predict_cached_async(*args, **kw).result()

    def predict(self, *args, **kw) -> SegOutput:
        """Predict segmentation for a batch of episodes (blocking).

        Args (NHWC; NCHW inputs are auto-transposed):
          query: (B, H, W, 3) in [-1, 1].
          supports/support_masks: (B, N, H, W, 3) in [-1, 1].
          out_size: target (H, W) of the prediction (the reference
            nearest-resizes to the query input size, pipeline `:473-474`).
          r_threshold: relative threshold — mask = mean_RGB > r * max
            (`main_oss.py:131-137`).
          threshold: absolute threshold on mean_RGB in [0,1].
        """
        return self.predict_async(*args, **kw).result()

    def predict_depth(
        self,
        query,
        supports,
        support_masks,
        *,
        shot_mask=None,
        denoising_steps: int = 1,
        out_size: Optional[Tuple[int, int]] = None,
        colorize: bool = True,
        ensemble: Optional[np.ndarray] = None,
    ) -> DepthOutput:
        """Depth-mode prediction (reference pipeline mode='depth'): decoded
        channel-mean in [0,1], bilinear-resized to the input size
        (`pipeline:473`), min-max normalized (`:531-537`), optionally
        colorized (`:553-561`)."""
        from diffews_tpu.ops.resize import bilinear_resize
        from diffews_tpu.utils.image import colorize_depth_maps

        query = _to_nhwc(np.asarray(query), 4)
        supports = _to_nhwc(np.asarray(supports), 5)
        support_masks = _to_nhwc(np.asarray(support_masks), 5)
        depth = self._predict_depth_jit(
            self.unet_params, self.vae_params,
            jnp.asarray(query), jnp.asarray(supports), jnp.asarray(support_masks),
            self.empty_text_embed,
            None if shot_mask is None else jnp.asarray(shot_mask),
            denoising_steps,
        )
        if out_size is not None and tuple(depth.shape[1:3]) != tuple(out_size):
            depth = bilinear_resize(depth[..., None], tuple(out_size))[..., 0]
        d = np.asarray(depth, dtype=np.float32)
        dmin = d.reshape(d.shape[0], -1).min(axis=1)[:, None, None]
        dmax = d.reshape(d.shape[0], -1).max(axis=1)[:, None, None]
        d = np.clip((d - dmin) / np.maximum(dmax - dmin, 1e-8), 0, 1)
        colored = None
        if colorize:
            colored = np.stack([
                (colorize_depth_maps(di, 0, 1)[0].transpose(1, 2, 0) * 255)
                .astype(np.uint8)
                for di in d
            ])
        return DepthOutput(depth_np=d, depth_colored=colored)

    def __call__(
        self,
        input_images,
        denoising_steps: int = 1,
        ensemble_size: int = 1,
        processing_res: int = 512,
        match_input_res: bool = True,
        batch_size: int = 0,
        show_progress_bar: bool = False,
        mode: str = "seg",
        rgb_paths=(),
        seed=None,
    ) -> SegOutput:
        """Reference-pipeline-compatible entry.

        `input_images` = [support_imgs (B*N,3,H,W), query_img (B,3,H,W),
        support_masks (B*N,3,H,W)] in [-1,1], the exact contract of the
        reference eval harness (`main_oss.py:106-123`).  Only mode='seg'
        ('semseg') is supported — the reference's depth/sr/normal modes sit
        on the vestigial Marigold path (SURVEY.md §2.2).

        ensemble_size is accepted but a single pass is computed: the
        DiffewS path is fully deterministic (VAE posterior MEAN latent,
        pipeline `:839-862`; degenerate one-step DDIM), so the reference's
        ensemble members are bit-identical and their mean (`:468`) equals
        one member.  All reference eval scripts use --ensemble_size 1.
        """
        if mode not in ("seg", "semseg", "depth"):
            raise NotImplementedError(
                "supported modes: seg/semseg/depth (sr/normal/feature belong "
                "to the vestigial Marigold pipeline, SURVEY.md §2.2)"
            )
        sup, qry, msk = (np.asarray(x) for x in input_images)
        b = qry.shape[0]
        n = sup.shape[0] // b
        sup = sup.reshape((b, n) + sup.shape[1:])
        msk = msk.reshape((b, n) + msk.shape[1:])
        out_size = tuple(qry.shape[-2:]) if match_input_res else None
        if mode == "depth":
            return self.predict_depth(
                qry, sup, msk, denoising_steps=denoising_steps, out_size=out_size
            )
        return self.predict(
            qry, sup, msk, denoising_steps=denoising_steps, out_size=out_size
        )


@partial(jax.jit, static_argnames=("relative",))
def device_mask_from_seg(img_u8: jax.Array, thr: jax.Array,
                         relative: bool) -> jax.Array:
    """In-graph replay of `PendingSeg.result()`'s threshold arithmetic
    (reference `main_oss.py:128-137`): p = uint8/255; relative=True uses
    the per-episode threshold max(p)·thr, else the absolute thr.  Returns
    bool (B, H, W).

    Serving lever: the default `/v1/segment` response is masks-only, so
    transferring the bool mask instead of the full uint8 seg image cuts
    device→host bytes ~24× (6.3 MB → 0.26 MB per 512px b8 batch — on the
    axon tunnel at ~20 MB/s that is ~300 ms/batch of pure waste; on PCIe
    it is still bandwidth).  Same f32 ops as the host formula; a decision
    differs only on an exact-tie ulp boundary (pinned ==host in
    tests/test_cached_serving.py on random uint8)."""
    # Replicate numpy's arithmetic EXACTLY: pairwise sum (a+b)+c, then TRUE
    # divisions.  Two ulp traps found by the equality test: jnp.mean
    # multiplies by a reciprocal, and XLA's algebraic simplifier strength-
    # reduces division by a CONSTANT to reciprocal-multiply — both flip
    # ~0.2% of decisions at tie pixels.  optimization_barrier hides the
    # constants so the divides stay real divides.  (Pinned ==host on the
    # CPU backend; a TPU ulp-tie divergence remains possible in principle
    # — the serving path is opt-in and self-consistent either way.)
    c255 = jax.lax.optimization_barrier(jnp.float32(255.0))
    c3 = jax.lax.optimization_barrier(jnp.float32(3.0))
    p = img_u8.astype(jnp.float32) / c255
    pm = ((p[..., 0] + p[..., 1]) + p[..., 2]) / c3
    if relative:
        t = p.reshape(p.shape[0], -1).max(axis=1) * thr
    else:
        t = jnp.broadcast_to(thr, (p.shape[0],))
    return pm > t[:, None, None]


class PendingSeg:
    """In-flight segmentation prediction (device array + threshold params)."""

    def __init__(self, img_device: jax.Array, r_threshold: float,
                 threshold: float, mask_device: Optional[jax.Array] = None):
        self._img = img_device
        self._r_threshold = r_threshold
        self._threshold = threshold
        self._mask_dev = mask_device

    def result(self, need_seg: bool = True) -> SegOutput:
        if self._mask_dev is not None:
            # mask computed in-graph (device_mask_from_seg): transfer the
            # packed bool mask, and the seg image only when asked for
            mask = np.asarray(self._mask_dev)
            seg = np.asarray(self._img) if need_seg else None
            return SegOutput(seg_colored=seg, mask=mask)
        seg = np.asarray(self._img)  # host transfer = the only sync point
        mask = None
        if self._r_threshold > 0 or self._threshold > 0:
            # PIL round-trip: to_tensor divides the uint8 image by 255
            # (main_oss.py:128-130).
            p = seg.astype(np.float32) / 255.0
            if self._r_threshold > 0:
                # reference uses a global max over the (bsz=1) tensor
                # (`main_oss.py:131-134`); per-episode max generalizes to B>1
                thr = p.reshape(p.shape[0], -1).max(axis=1) * self._r_threshold
                mask = p.mean(axis=-1) > thr[:, None, None]
            else:
                mask = p.mean(axis=-1) > self._threshold
        return SegOutput(seg_colored=seg, mask=mask)


def _to_nhwc(x: np.ndarray, ndim: int) -> np.ndarray:
    """Accept NCHW (reference convention) or NHWC; return NHWC."""
    if x.ndim != ndim:
        raise ValueError(f"expected {ndim}-D array, got {x.shape}")
    if x.shape[-3] == 3 and x.shape[-1] != 3:
        return np.moveaxis(x, -3, -1)
    return x
