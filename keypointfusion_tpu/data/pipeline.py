"""Host input pipeline: threaded sample loading, collation, and
double-buffered host→HBM prefetch.

Replaces torch DataLoader(num_workers=8) + per-batch .cuda() copies
(reference train.py:124-143, 203-204) with a thread pool (the per-sample
work is numpy/cv2 which releases the GIL) and an iterator that keeps the
next batch's device transfer in flight while the current step runs — the
BASELINE north star's "double-buffered host→HBM RGB-D loading".
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
import itertools
import queue
import threading
from typing import Iterator, Optional

import numpy as np


def collate(samples) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class BatchLoader:
    """Iterable over collated numpy batches with background workers."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = True,
                 seed: int = 0, max_prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1):
        """process_index/process_count: multi-host data sharding — each
        host iterates a disjoint 1/process_count slice of the (shared-seed
        shuffled) index order, the standard jax multi-process input
        pattern (pass jax.process_index()/jax.process_count())."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.max_prefetch = max_prefetch
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self._epoch = 0

    def _local_len(self):
        return len(self.dataset) // self.process_count \
            if self.process_count > 1 else len(self.dataset)

    def __len__(self):
        n = self._local_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_count > 1:
            order = order[self.process_index::self.process_count][
                :self._local_len()]
        self._epoch += 1
        nb = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        with futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending = collections.deque()

            def submit(idxs):
                pending.append([pool.submit(self.dataset.__getitem__, i)
                                for i in idxs])

            it = iter(batches)
            for idxs in itertools.islice(it, self.max_prefetch):
                submit(idxs)
            for idxs in it:
                ready = pending.popleft()
                submit(idxs)
                yield collate([f.result() for f in ready])
            while pending:
                yield collate([f.result() for f in pending.popleft()])


def device_prefetch(batch_iter, sharding=None, depth: int = 2):
    """Wrap a numpy-batch iterator with asynchronous device placement:
    the next `depth` batches' host→HBM copies overlap the current step.
    With a NamedSharding, arrays land batch-sharded across the mesh."""
    import jax

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    buf = collections.deque()
    it = iter(batch_iter)
    for batch in itertools.islice(it, depth):
        buf.append(put(batch))
    for batch in it:
        out = buf.popleft()
        buf.append(put(batch))
        yield out
    while buf:
        yield buf.popleft()
