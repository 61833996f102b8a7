"""Minimal training-loop usage: a few in-context training steps on CPU.

The real entry point is `python -m diffews_tpu.cli.train` (mirrors the
reference trainer's flags); this shows the underlying library pieces —
`TrainerConfig`, `init_state`, `make_train_step` — for embedding the step
in a custom loop.  Uses tiny random-init configs so it runs anywhere.

    python examples/train_tiny.py
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

import jax.numpy as jnp
import numpy as np

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.training.state import TrainerConfig, init_state, make_train_step


def main():
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    text = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.float32)

    cfg = TrainerConfig(
        learning_rate=1e-5,
        max_train_steps=3,
        gradient_accumulation_steps=1,
        compute_dtype=jnp.float32,   # bf16 on TPU
        remat=False,                 # True on TPU to fit 512px in 16 GB
        use_ema=True,
        max_nshot=2,
    )
    state = init_state(cfg, up)
    step = jax.jit(make_train_step(cfg, ucfg, vcfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    b, n, s = 2, 2, 32
    f = lambda *sh: rng.uniform(-1, 1, sh).astype(np.float32)
    for i in range(3):
        batch = {
            "query": f(1, b, s, s, 3),
            "q_mask3": f(1, b, s, s, 3),        # GT mask as a [-1,1] image
            "supports": f(1, b, n, s, s, 3),
            "s_mask3": f(1, b, n, s, s, 3),
            "shot_mask": np.ones((1, b, n), bool),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(i), vp, text)
        print(f"step {int(state.step)}: loss {float(metrics['loss']):.5f} "
              f"grad_norm {float(metrics['grad_norm']):.3f}")

    # --- LoRA variant: train rank-r adapters instead of the base UNet ----
    # (CLI: --lora_rank; optimizer state shrinks ~300x, checkpoints still
    # write the merged model in diffusers layout.)
    from diffews_tpu.training import lora as lora_lib

    # fresh base tree: the donated full-FT step above consumed `up`'s buffers
    base = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    lcfg = TrainerConfig(max_train_steps=2, gradient_accumulation_steps=1,
                         compute_dtype=jnp.float32, remat=False, lora_rank=4)
    lora0 = lora_lib.init_lora(jax.random.PRNGKey(2), base, rank=4)
    lstate = init_state(lcfg, lora0)
    lstep = jax.jit(lora_lib.make_lora_train_step(lcfg, ucfg, vcfg),
                    donate_argnums=(0,))
    lstate, lm = lstep(lstate, batch, jax.random.PRNGKey(9), base, vp, text)
    merged = lora_lib.merge_lora(base, lstate.params, lora_lib.lora_scale(lcfg))
    n_lora = sum(x.size for x in jax.tree_util.tree_leaves(lstate.params))
    print(f"LoRA step: loss {float(lm['loss']):.5f} "
          f"({n_lora/1e3:.1f}k trainable params; merged tree ready)")


if __name__ == "__main__":
    main()
