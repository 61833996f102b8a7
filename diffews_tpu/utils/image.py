"""Image utilities (counterpart of `marigold/util/image_util.py`).

`resize_max_res` lives in `diffews_tpu.data.transforms`; here are the
colorization/layout helpers the reference pipeline uses for depth output
(`marigold_pipeline_rgb_latent_noise.py:529-545`, `image_util.py:7-61`).
"""

from __future__ import annotations

import numpy as np


def norm_to_rgb(norm: np.ndarray) -> np.ndarray:
    """(3,H,W) surface normals in [-1,1] -> uint8 RGB (`image_util.py:7-12`)."""
    return ((norm + 1.0) * 0.5 * 255).clip(0, 255).astype(np.uint8)


def chw2hwc(chw: np.ndarray) -> np.ndarray:
    assert chw.ndim == 3
    return np.transpose(chw, (1, 2, 0))


def colorize_depth_maps(depth_map, min_depth: float, max_depth: float,
                        cmap: str = "Spectral", valid_mask=None) -> np.ndarray:
    """Depth (H,W) or (B,H,W) -> colorized (B,3,H,W) in [0,1]
    (`image_util.py:14-52`)."""
    import matplotlib

    depth = np.asarray(depth_map, dtype=np.float32)
    if depth.ndim == 2:
        depth = depth[None]
    depth = depth.squeeze() if depth.ndim == 4 else depth
    if depth.ndim == 2:
        depth = depth[None]
    depth = (depth - min_depth) / max(max_depth - min_depth, 1e-8)
    cm = matplotlib.colormaps[cmap]
    img = cm(depth.clip(0, 1), bytes=False)[..., :3]  # (B,H,W,3)
    if valid_mask is not None:
        vm = np.asarray(valid_mask).squeeze()
        if vm.ndim == 2:
            vm = vm[None]
        img[~vm] = 0
    return np.transpose(img, (0, 3, 1, 2))
