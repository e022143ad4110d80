"""Fixed-shape batching with threaded prefetch.

The reference uses DataLoader worker *processes* (core/train_pcn.py:26-39);
here host-side IO (native PCD parse + numpy transforms) runs in a thread
pool overlapping device compute, and finished batches are prefetched into a
bounded queue. Shapes are fixed end-to-end: every batch has exactly
``batch_size`` samples (the trailing remainder wraps around at train time
and is padded-by-repeat at eval, with a validity count reported so eval
metrics can ignore the padding).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


class Batch:
    """A host batch: stacked arrays + ids + number of valid (non-pad) rows."""

    __slots__ = ("taxonomy_ids", "model_ids", "data", "valid")

    def __init__(self, taxonomy_ids, model_ids, data, valid):
        self.taxonomy_ids = taxonomy_ids
        self.model_ids = model_ids
        self.data = data
        self.valid = valid


class Loader:
    """Threaded map + prefetch loader over an indexable dataset.

    Args:
        dataset: indexable returning (taxonomy_id, model_id, dict of arrays).
        batch_size: fixed batch size.
        shuffle: reshuffle each epoch.
        drop_last: drop the trailing partial batch (train default False in
            the reference; the partial batch is instead padded).
        pad_mode: 'repeat' pads the final batch by repeating its first
            samples (eval: padding rows flagged via ``batch.valid``).
        num_workers: IO threads.
        prefetch: queue depth.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        out = []
        for i in range(0, n, self.batch_size):
            chunk = order[i : i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            out.append(chunk)
        return out

    def __iter__(self) -> Iterator[Batch]:
        batches = self._batches_indices()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            # A producer-side exception must reach the consumer: a silently
            # dead producer would leave q.get() blocked forever.
            try:
                with ThreadPoolExecutor(max(1, self.num_workers)) as pool:
                    for chunk in batches:
                        samples = list(pool.map(self.dataset.__getitem__, chunk))
                        q.put(self._collate(samples))
                q.put(sentinel)
            except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def _collate(self, samples) -> Batch:
        valid = len(samples)
        while len(samples) < self.batch_size:  # pad by repeating
            samples.append(samples[len(samples) % valid])
        taxonomy_ids = [s[0] for s in samples]
        model_ids = [s[1] for s in samples]
        keys = samples[0][2].keys()
        data: Dict[str, np.ndarray] = {
            k: np.stack([s[2][k] for s in samples]).astype(np.float32) for k in keys
        }
        return Batch(taxonomy_ids, model_ids, data, valid)
