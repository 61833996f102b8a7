"""Self-regression golden fixtures: pin OUR OWN tiny-model numerics.

The diffusers-anchored goldens (`tools/make_golden.py` / `tests/test_golden.py`)
need an environment with diffusers and so skip here.  This tool closes the
*internal* drift gap instead: it computes a deterministic set of tiny-config
forward/loss outputs (fixed `jax.random` init keys, fixed NumPy inputs, f32
on the CPU backend) and commits them as `tests/golden/self_golden.npz`.
`tests/test_self_golden.py` recomputes the same quantities at every run and
compares against the committed fixture — so a refactor of the UNet, VAE,
CLIP, scheduler, pipeline threshold path, or training loss that silently
changes numerics fails the suite instead of surfacing as an unexplained
mIoU shift three rounds later.

The pinned surfaces (chosen to cover every numeric path an eval/train run
crosses):
  - joint KV-fusion UNet forward, n-shot=2 with a padded shot
    (shot_mask pins the pad-masking arithmetic)
  - attn-mask UNet variant (per-level support-key bias)
  - VAE encode moments / mean latent / decode round trip
  - CLIP text encoder forward
  - DDIM degenerate 1-step algebra (x0 == -eps fold used by the pipeline)
  - full `DiffewsPipeline.predict` episode (uint8 seg + threshold mask)
  - training episode loss + gradient norm (the in-context regression
    objective, reference `train_icl_*_v3.py:1336-1384`)

Regenerate (after an INTENTIONAL numeric change — say why in the commit):

    python tools/make_self_golden.py

Tolerances in the test are tight-but-not-bitwise (XLA CPU codegen may
re-associate across versions); uint8 outputs allow a 1-count quantization
wiggle on a small pixel fraction.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "self_golden.npz"
)


def compute_fixtures() -> dict:
    """Deterministically compute every pinned quantity (CPU, f32)."""
    import jax
    import jax.numpy as jnp

    from diffews_tpu import checkpoint as C
    from diffews_tpu import scheduler as S
    from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
    from diffews_tpu.models import clip_text, unet, vae
    from diffews_tpu.pipeline import DiffewsPipeline
    from diffews_tpu.training import state as T

    out = {}
    rng = np.random.default_rng(1234)
    ucfg, vcfg, ccfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    cp = jax.jit(lambda r: clip_text.init_params(r, ccfg))(jax.random.PRNGKey(2))

    # --- joint UNet, 2 shots with the second padded out -------------------
    sample = rng.standard_normal((1, 8, 8, ucfg.in_channels)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, ucfg.cross_attention_dim)).astype(np.float32)
    ref = rng.standard_normal((1, 2, 8, 8, ucfg.ref_in_channels)).astype(np.float32)
    shot_mask = np.array([[True, False]])
    out["unet_joint"] = np.asarray(
        unet.forward(up, ucfg, jnp.asarray(sample), 1, jnp.asarray(ctx),
                     ref_sample=jnp.asarray(ref), shot_mask=jnp.asarray(shot_mask))
    )

    # --- attn-mask variant -------------------------------------------------
    ref4 = rng.standard_normal((1, 2, 8, 8, ucfg.in_channels)).astype(np.float32)
    rmask = (rng.random((1, 2, 32, 32)) > 0.5).astype(np.float32)
    out["unet_attnmask"] = np.asarray(
        unet.forward(up, ucfg, jnp.asarray(sample), 1, jnp.asarray(ctx),
                     ref_sample=jnp.asarray(ref4), ref_mask=jnp.asarray(rmask))
    )

    # --- VAE ----------------------------------------------------------------
    img = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    out["vae_moments"] = np.asarray(vae.encode_moments(vp, vcfg, jnp.asarray(img)))
    mean = vae.encode_mean_latent(vp, vcfg, jnp.asarray(img))
    out["vae_mean"] = np.asarray(mean)
    out["vae_dec"] = np.asarray(vae.decode(vp, vcfg, mean))

    # --- CLIP text encoder --------------------------------------------------
    ids = (np.arange(8, dtype=np.int64)[None, :] * 37 + 3) % ccfg.vocab_size
    out["clip_ids"] = ids
    out["clip_out"] = np.asarray(clip_text.forward(cp, ccfg, jnp.asarray(ids)))

    # --- DDIM degenerate algebra ---------------------------------------------
    sched = S.DDIMScheduler(SchedulerConfig.diffews())
    sched.set_timesteps(1)
    t = int(sched.timesteps[0])
    model_out = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    lat = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    step = sched.step(jnp.asarray(model_out), t, jnp.asarray(lat))
    out["sched_t"] = np.array([t])
    out["sched_x0"] = np.asarray(step.pred_original_sample)
    out["sched_prev"] = np.asarray(step.prev_sample)

    # --- full pipeline episode ----------------------------------------------
    bundle = C.PipelineBundle(up, ucfg, vp, vcfg, None, ccfg, SchedulerConfig.diffews())
    pipe = DiffewsPipeline(bundle)
    q = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    sup = rng.uniform(-1, 1, (1, 2, 32, 32, 3)).astype(np.float32)
    msk = np.where(rng.random((1, 2, 32, 32, 3)) > 0.5, 1.0, -1.0).astype(np.float32)
    seg = pipe.predict(q, sup, msk, r_threshold=0.25)
    out["pipe_seg"] = seg.seg_colored
    out["pipe_mask"] = seg.mask.astype(np.uint8)

    # --- training episode loss + grad norm ------------------------------------
    tcfg = T.TrainerConfig(compute_dtype=jnp.float32, adam_mu_dtype=jnp.float32,
                           remat=False, max_nshot=2)
    loss_fn = T.make_episode_loss(tcfg, ucfg, vcfg)
    micro = {
        "query": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
        "q_mask3": np.where(rng.random((1, 32, 32, 3)) > 0.5, 1.0, -1.0).astype(np.float32),
        "supports": rng.uniform(-1, 1, (1, 2, 32, 32, 3)).astype(np.float32),
        "s_mask3": np.where(rng.random((1, 2, 32, 32, 3)) > 0.5, 1.0, -1.0).astype(np.float32),
        "shot_mask": np.array([[True, True]]),
    }
    text_embed = rng.standard_normal((1, 7, ucfg.cross_attention_dim)).astype(np.float32)
    micro_j = {k: jnp.asarray(v) for k, v in micro.items()}

    def scalar_loss(p):
        return loss_fn(p, vp, jnp.asarray(text_embed), micro_j, jax.random.PRNGKey(3))

    loss, grads = jax.jit(jax.value_and_grad(scalar_loss))(up)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    out["train_loss"] = np.asarray(loss)[None]
    out["train_grad_norm"] = np.asarray(gnorm, dtype=np.float32)[None]
    return out


def main():
    import jax

    if jax.default_backend() != "cpu":  # the fixture is defined on CPU f32
        raise SystemExit(
            "self-goldens are pinned on the CPU backend; run under the test "
            "conftest or force jax_platforms=cpu in-process first"
        )
    fixtures = compute_fixtures()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **fixtures)
    total = sum(v.nbytes for v in fixtures.values())
    print(f"wrote {os.path.normpath(FIXTURE)} ({len(fixtures)} arrays, "
          f"{total/1024:.1f} KiB uncompressed)")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
