"""Episode loader: batching, shuffling, threaded prefetch.

Replaces the reference's torch DataLoader (`evaluation_util/data/dataset.py:
43-49`) with a NumPy-native loader.  Eval iterates sequentially with no
workers — required for seeded episode reproducibility (the datasets draw
from the global NumPy RNG in __getitem__ call order); training shuffles and
may prefetch with threads (PIL/NumPy release the GIL during decode).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(episodes: List[Dict]) -> Dict:
    out: Dict = {}
    for k in episodes[0]:
        vals = [ep[k] for ep in episodes]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


class EpisodeLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 0, seed: Optional[int] = None,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> Iterator[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            batch = idx[i : i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield list(batch)

    def __iter__(self) -> Iterator[Dict]:
        if self.num_workers <= 0:
            for batch_idx in self._index_batches():
                yield collate([self.dataset[i] for i in batch_idx])
            return

        # Threaded prefetch: a producer thread fills a bounded queue so host
        # IO/decoding overlaps device compute.  Episode RNG stays in the
        # single producer thread, preserving determinism per (seed, order).
        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        _SENTINEL = object()

        def producer():
            try:
                for batch_idx in self._index_batches():
                    q.put(collate([self.dataset[i] for i in batch_idx]))
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
