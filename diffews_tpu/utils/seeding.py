"""Seed pinning (counterpart of `evaluation_util/common/utils.py:8-17`).

The eval protocol is defined by the exact global-RNG state: both harnesses
call this before building dataloaders (`main_oss.py:33-36`).  JAX itself is
deterministic per PRNGKey; host-side episode sampling uses the legacy NumPy
global RNG for reference parity.
"""

from __future__ import annotations

import random

import numpy as np


def fix_randseed(seed: int | None):
    """Pin python/NumPy global RNGs (and torch's, when torch is around —
    the data layer itself never uses torch RNG)."""
    if seed is None:
        seed = int(np.random.randint(0, 2**31))
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return seed
