"""Exponential moving average of parameters.

Counterpart of the diffusers `EMAModel` the reference optionally maintains
(`train_tools/train_icl_*_v3.py:1108-1112,1400-1401`): decay warms up as
min(max_decay, (1 + step) / (10 + step)) and the EMA tree is checkpointed as
`unet_ema/` alongside `unet/`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict
    step: jax.Array  # int32 scalar


def init(params: dict) -> EMAState:
    # Deep copy: the EMA tree must not alias the live param buffers, or
    # donating the train state would donate the same buffer twice.
    return EMAState(params=jax.tree_util.tree_map(lambda x: x + 0, params),
                    step=jnp.zeros((), jnp.int32))


def update(state: EMAState, new_params: dict, max_decay: float = 0.9999) -> EMAState:
    step = state.step + 1
    decay = jnp.minimum(max_decay, (1.0 + step) / (10.0 + step))
    ema = jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        state.params, new_params,
    )
    return EMAState(params=ema, step=step)
