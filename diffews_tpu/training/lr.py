"""LR schedules (diffusers `get_scheduler` semantics).

The canonical DiffewS config uses `polynomial` with zero warmup over
20000 * num_processes steps (`train_tools/train_icl_*_v3.py:1217-1223`,
`scripts/train_*.sh: --lr_scheduler polynomial`): linear decay from lr_init
to lr_end=1e-7 (power 1.0).
"""

from __future__ import annotations

import optax


def polynomial_with_warmup(
    lr_init: float,
    num_training_steps: int,
    num_warmup_steps: int = 0,
    lr_end: float = 1e-7,
    power: float = 1.0,
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            num_warmup_steps > 0, step / jnp.maximum(num_warmup_steps, 1), 1.0
        )
        decay_steps = max(num_training_steps - num_warmup_steps, 1)
        pct_remaining = 1.0 - (step - num_warmup_steps) / decay_steps
        pct_remaining = jnp.clip(pct_remaining, 0.0, 1.0)
        decayed = (lr_init - lr_end) * pct_remaining**power + lr_end
        lr = jnp.where(step < num_warmup_steps, lr_init * warm, decayed)
        return lr

    return schedule


def constant(lr_init: float) -> optax.Schedule:
    return lambda step: lr_init


def get_schedule(name: str, lr_init: float, num_training_steps: int,
                 num_warmup_steps: int = 0, power: float = 1.0) -> optax.Schedule:
    if name == "polynomial":
        return polynomial_with_warmup(lr_init, num_training_steps, num_warmup_steps,
                                      power=power)
    if name == "constant":
        return constant(lr_init)
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0 if num_warmup_steps else lr_init, lr_init, num_warmup_steps,
            num_training_steps,
        )
    if name == "linear":
        return polynomial_with_warmup(lr_init, num_training_steps, num_warmup_steps,
                                      lr_end=0.0)
    raise ValueError(f"unknown lr schedule {name!r}")
