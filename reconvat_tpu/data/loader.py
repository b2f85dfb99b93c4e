"""Batching + background prefetch.

Replaces the reference's torch DataLoader (num_workers=0, per-item
`.to(device)` inside `__getitem__`, `model/dataset.py:52-54`) with a
host-side numpy batcher whose assembly runs in a background thread, so
crop/stack work overlaps TPU compute. Device transfer happens once per
batch at the jit boundary.
"""
from __future__ import annotations

import queue
import threading

import numpy as np

BATCH_KEYS = ("audio", "onset", "offset", "frame", "velocity")


def collate(items):
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if key in BATCH_KEYS:
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals if len(vals) > 1 else vals[0]
    return batch


def device_batch(batch):
    """Strip non-array metadata (paths, crop offsets) before the jit
    boundary."""
    return {k: v for k, v in batch.items() if k in BATCH_KEYS}


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=True, drop_last=False,
                 seed=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            idx = order[i:i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def __iter__(self):
        if self.prefetch <= 0:
            for idx in self._index_batches():
                yield collate([self.dataset[j] for j in idx])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for idx in self._index_batches():
                    q.put(collate([self.dataset[j] for j in idx]))
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()


def cycle(loader):
    """Endless re-iteration (reference `helper_functions.cycle`).

    Guards against a loader that yields no batches (dataset smaller than
    batch_size with drop_last) — the reference silently spins forever in
    that case; we fail with an actionable message instead."""
    if len(loader) == 0:
        raise ValueError(
            f"DataLoader yields 0 batches: dataset has {len(loader.dataset)}"
            f" item(s) < batch_size={loader.batch_size} with drop_last —"
            " lower the batch size or provide more files")
    while True:
        yield from loader


def prefetch_to_device(iterator, size: int = 2, put=None):
    """Yield batches already resident on the default device, keeping `size`
    transfers in flight ahead of the consumer (double buffering: the H2D
    copy of batch i+1 overlaps the step on batch i).

    `put` overrides the placement of a whole batch dict (mesh training
    passes `parallel.mesh`-aware sharding here, see train/driver.py)."""
    import collections

    import jax

    queue = collections.deque()

    def _put(batch):
        if put is not None:
            return put(batch)
        return {k: (jax.device_put(v) if k in BATCH_KEYS else v)
                for k, v in batch.items()}

    for batch in iterator:
        queue.append(_put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class MappedLoader:
    """Sized loader wrapper applying `fn` to every yielded batch (used to
    route full-epoch sweeps through mesh sharding, train/driver.py)."""

    def __init__(self, loader, fn):
        self.loader = loader
        self.fn = fn

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            yield self.fn(batch)
