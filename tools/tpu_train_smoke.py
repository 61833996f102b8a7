"""Full-size (SD-2.1, 512px) training-step smoke on one TPU chip.

Validates the jitted train step (fwd+bwd with remat, bf16 compute, fp32
master+Adam) fits HBM and measures step time at b1/gas1, 1-shot — the
reference's canonical single-GPU configuration
(`scripts/train_cocofold0_*.sh`: bs1 gas4 on a 24GB 4090).

Two measurement modes (VERDICT r3 #4 — the repo's training-throughput
numbers disagreed 2-3x because these were conflated):
  * per-step-synced: every step host-reads its loss — each step pays the
    full axon-tunnel round-trip and drains the dispatch pipeline (what the
    565-738 ms CLAUDE.md figures measured).
  * pipelined window: N steps dispatched back-to-back, ONE host read at
    the end — the steady-state the real train CLI runs between logging
    intervals (loss is read every --logging_steps only), and what the
    sustained artifact's 246 ms/step windowed rate reflects.  Each step
    still chains on the previous through the donated train state, so the
    window time is N real sequential optimizer updates; only the
    host<->device sync overhead is amortized.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from diffews_tpu.configs import UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.training.state import TrainerConfig, init_state, make_train_step


def main(attn_impl="auto", reps=6):
    ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
    up = jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1))
    cfg = TrainerConfig(gradient_accumulation_steps=1, max_nshot=1,
                        compute_dtype=jnp.bfloat16, remat=True,
                        attn_impl=attn_impl)
    state = init_state(cfg, up)
    vp16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), vp)
    text = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16)
    step = jax.jit(make_train_step(cfg, ucfg, vcfg), donate_argnums=(0,))
    print("built", flush=True)

    def mk(seed):
        r = np.random.default_rng(seed)
        f = lambda *sh: r.uniform(-1, 1, sh).astype(np.float32)
        return {
            "query": f(1, 1, 512, 512, 3),
            "q_mask3": f(1, 1, 512, 512, 3),
            "supports": f(1, 1, 1, 512, 512, 3),
            "s_mask3": f(1, 1, 1, 512, 512, 3),
            "shot_mask": np.ones((1, 1, 1), bool),
        }

    t0 = time.time()
    state, m = step(state, mk(0), jax.random.PRNGKey(0), vp16, text)
    print(f"compile+first: {time.time() - t0:.1f}s loss={float(m['loss']):.4f}",
          flush=True)
    ts = []
    for i in range(reps):
        batch = mk(i + 1)
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(i + 1), vp16, text)
        loss = float(m["loss"])  # host read = honest sync
        ts.append(time.perf_counter() - t0)
        print(f"step: {ts[-1] * 1e3:.0f} ms loss={loss:.4f}", flush=True)
    stats = jax.devices()[0].memory_stats() or {}
    used = stats.get("bytes_in_use", 0) / (1 << 30)
    print(f"steady step (per-step-synced): {min(ts) * 1e3:.0f} ms "
          f"({1 / min(ts):.2f} steps/s), HBM in use {used:.1f} GiB",
          flush=True)

    # pipelined window: dispatch N sequential steps, host-read once — the
    # CLI's between-logging-intervals steady state (see module docstring)
    n_win = reps * 2
    batches = [mk(100 + i) for i in range(n_win)]
    t0 = time.perf_counter()
    for i, batch in enumerate(batches):
        state, m = step(state, batch, jax.random.PRNGKey(100 + i), vp16, text)
    loss = float(m["loss"])  # single honest sync: chains through all steps
    dt = time.perf_counter() - t0
    print(f"pipelined window: {n_win} steps in {dt:.2f}s -> "
          f"{dt / n_win * 1e3:.0f} ms/step ({n_win / dt:.2f} steps/s) "
          f"loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main(attn_impl=sys.argv[1] if len(sys.argv) > 1 else "auto",
         reps=int(sys.argv[2]) if len(sys.argv) > 2 else 6)
