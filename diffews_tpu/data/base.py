"""Shared episodic-dataset machinery.

Episodes are host-side NumPy; devices only ever see fixed-shape batches.
Sampling uses the *global* NumPy legacy RNG in the same call order as the
reference datasets so that `seed(0)` replays the identical 1000/2300/2500
evaluation episodes (SURVEY.md §7 "Seeded episode-sampling parity").
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from diffews_tpu.data.transforms import ImageTransform, nearest_resize_mask


class EpisodicDataset:
    """Base: subclasses set `benchmark`, `class_ids` and implement
    `__len__`/`get_episode(idx) -> dict`."""

    benchmark: str = ""
    class_ids: List[int] = []

    def __init__(self, datapath: str, fold: int, transform: ImageTransform,
                 split: str, shot: int, use_original_imgsize: bool = False):
        self.datapath = datapath
        self.fold = fold
        self.transform = transform
        self.split = "val" if split in ("val", "test") else "trn"
        self.shot = shot
        self.use_original_imgsize = use_original_imgsize

    # -- helpers ------------------------------------------------------------

    def _img(self, path: str) -> Image.Image:
        return Image.open(path).convert("RGB")

    def _episode(
        self,
        query_img: Image.Image,
        query_mask: np.ndarray,
        support_imgs: List[Image.Image],
        support_masks: List[np.ndarray],
        class_id: int,
        query_name: str,
        support_names: List[str],
        rgb_path: str,
        org_qry_imsize,
        query_ignore_idx: Optional[np.ndarray] = None,
    ) -> Dict:
        """Apply transforms and assemble the episode dict (NCHW, [-1,1])."""
        s = self.transform.img_size
        q = self.transform(query_img)
        if not self.use_original_imgsize:
            query_mask = nearest_resize_mask(query_mask, (s, s))
            if query_ignore_idx is not None:
                query_ignore_idx = nearest_resize_mask(query_ignore_idx, (s, s))
        sup = np.stack([self.transform(im) for im in support_imgs])
        smasks = np.stack([nearest_resize_mask(m, (s, s)) for m in support_masks])
        ep = {
            "rgb_path": rgb_path,
            "query_img": q,
            "query_mask": query_mask.astype(np.float32),
            "query_name": query_name,
            "org_query_imsize": org_qry_imsize,
            "support_imgs": sup,
            "support_masks": smasks,
            "support_names": support_names,
            "class_id": int(class_id),
        }
        if query_ignore_idx is not None:
            ep["query_ignore_idx"] = query_ignore_idx.astype(np.float32)
        return ep

    def __getitem__(self, idx: int) -> Dict:
        return self.get_episode(idx)

    def get_episode(self, idx: int) -> Dict:  # pragma: no cover - abstract
        raise NotImplementedError
