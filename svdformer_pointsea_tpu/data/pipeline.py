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
        self.seed = seed
        self._epoch = 0  # bumped per __iter__; feeds shuffle + per-sample rng

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch number used by the NEXT ``__iter__``.

        All data randomness (shuffle order and per-sample augmentation
        seeds) derives statelessly from ``(seed, epoch, index)``, so a run
        resumed at epoch k replays exactly the batches the straight run saw
        at epoch k — the property the resume state-exactness test asserts
        (tests/test_orchestration.py). Without set_epoch, epochs number
        1, 2, ... per iteration as before.
        """
        self._epoch = int(epoch) - 1

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches_indices(self, epoch: int) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # Stateless per-(seed, epoch) order: a stateful RandomState
            # advanced once per __iter__ would make the order depend on how
            # many epochs THIS process has run — broken under resume.
            ss = np.random.SeedSequence([self.seed, epoch])
            np.random.RandomState(ss.generate_state(1)[0]).shuffle(order)
        out = []
        for i in range(0, n, self.batch_size):
            chunk = order[i : i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            out.append(chunk)
        return out

    def __iter__(self) -> Iterator[Batch]:
        self._epoch += 1
        epoch = self._epoch
        batches = self._batches_indices(epoch)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        # Deterministic threaded augmentation: a dataset advertising
        # ``per_sample_rng`` gets a fresh per-(seed, epoch, index)
        # RandomState per __getitem__ — a SHARED stream consumed from
        # worker threads would race on interleaving order, making runs
        # non-reproducible (the reference's process workers are seeded
        # deterministically instead). Epoch is in the seed so augmentation
        # still varies across epochs.
        if getattr(self.dataset, "per_sample_rng", False):

            def fetch(i):
                ss = np.random.SeedSequence([self.seed, epoch, int(i)])
                return self.dataset.__getitem__(
                    int(i), rng=np.random.RandomState(ss.generate_state(1)[0])
                )

        else:
            fetch = self.dataset.__getitem__
        # Set when the consumer abandons the iterator (e.g. a max_steps
        # break mid-epoch): without it the producer blocks forever on
        # q.put against the full queue, leaking the thread and keeping
        # dataset IO running against the single CPU.
        abandoned = threading.Event()

        def _put(item) -> bool:
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # A producer-side exception must reach the consumer: a silently
            # dead producer would leave q.get() blocked forever.
            try:
                with ThreadPoolExecutor(max(1, self.num_workers)) as pool:
                    for chunk in batches:
                        if abandoned.is_set():
                            return
                        samples = list(pool.map(fetch, chunk))
                        if not _put(self._collate(samples)):
                            return
                _put(sentinel)
            except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Runs on generator close/GC too (early consumer break).
            abandoned.set()

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
