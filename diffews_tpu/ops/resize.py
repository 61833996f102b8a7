"""Resize ops reproducing torch `F.interpolate` semantics exactly.

mIoU parity depends on bit-faithful resize behavior (SURVEY.md §7 "Hard
parts"): the reference nearest-resizes masks and predictions with
`F.interpolate(..., mode='nearest')` (e.g. `evaluation_util/data/coco.py:42-47`,
pipeline postprocess `marigold_pipeline_rgb_latent_noise.py:473-474`), whose
(legacy) index rule is `src = floor(dst * in/out)` — NOT the half-pixel rule
of jax.image.resize("nearest").  These functions are validated against
torch-cpu in tests/test_resize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch legacy 'nearest': floor(i * in/out), computed in float; clamp for safety.
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def nearest_resize(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize of NHWC (or NHW) arrays, torch-`interpolate` compatible."""
    h_out, w_out = out_hw
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    b, h, w, c = x.shape
    if (h, w) != (h_out, w_out):
        ih = jnp.asarray(_nearest_indices(h, h_out))
        iw = jnp.asarray(_nearest_indices(w, w_out))
        x = x[:, ih, :, :][:, :, iw, :]
    return x[..., 0] if squeeze else x


def bilinear_resize(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize (align_corners=False, no antialias), NHWC.

    Matches torch `F.interpolate(mode='bilinear')` — used by the reference
    only for the depth path; provided for capability parity.
    """
    h_out, w_out = out_hw
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x

    def axis_weights(in_size, out_size):
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = src - lo
        return lo, hi, frac.astype(np.float32)

    hlo, hhi, hf = axis_weights(h, h_out)
    wlo, whi, wf = axis_weights(w, w_out)
    hf = jnp.asarray(hf)[None, :, None, None]
    wf = jnp.asarray(wf)[None, None, :, None]

    top = x[:, hlo, :, :]
    bot = x[:, hhi, :, :]
    row = top * (1 - hf) + bot * hf
    left = row[:, :, wlo, :]
    right = row[:, :, whi, :]
    return left * (1 - wf) + right * wf


def uint8_quantize(x: jax.Array) -> jax.Array:
    """clip to [0,255] then truncate-cast to uint8.

    Reproduces the reference's `clip(0,255).cpu().numpy().astype(np.uint8)`
    round-trip (pipeline `:532-534`) that the relative threshold depends on.
    """
    return jnp.clip(x, 0, 255).astype(jnp.uint8)
