"""Minimal host-side data loader: shuffling, batching, prefetch, host sharding.

Replaces torch ``DataLoader`` + ``DistributedSampler``
(train_classification.py:65-90).  Datasets are map-style (``__len__`` /
``__getitem__`` returning a dict of numpy arrays).  Batches are stacked numpy
dicts, ready for ``parallel.shard_batch``.  Multi-host training shards the
*index space* per process (the DistributedSampler equivalent) — each host
loads only its slice and GSPMD sees a per-host batch shard.

``num_workers > 1`` builds batches concurrently in a thread pool (numpy
releases the GIL in the augmentation math, so threads overlap well and avoid
the torch worker-process fork/pickle machinery).  Datasets whose
``__getitem__`` uses a shared ``RandomState`` are not thread-safe — the
in-tree datasets derive a per-item rng instead (see ``item_rng``).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def item_rng(seed, epoch, index):
    """Deterministic per-(epoch, item) RandomState — safe under concurrent
    workers, reproducible across runs (the torch answer is per-worker
    seeding; per-item is stronger)."""
    return np.random.RandomState(
        (seed * 1000003 + epoch * 7919 + index * 31 + 1) % (2 ** 31 - 1))


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_last=True, num_workers=0, process_index=0,
                 process_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = num_workers
        self.prefetch = max(2, num_workers)

    def set_epoch(self, epoch):
        """Reseed shuffling per epoch (DistributedSampler.set_epoch
        equivalent, train_classification.py:182)."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        gbs = self.batch_size * self.process_count
        if self.drop_last:
            return len(self.dataset) // gbs
        return -(-len(self.dataset) // gbs)

    def _indices(self):
        """The FULL shuffled (padded) index sequence — identical on every
        process; per-process selection happens per batch in _build_batch."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # pad so every process sees the same number of full batches
        gbs = self.batch_size * self.process_count
        per = -(-n // gbs) * gbs if not self.drop_last else n
        if per > n:
            idx = np.concatenate([idx, idx[: per - n]])
        return idx

    def _collate(self, items):
        out = {}
        for k in items[0]:
            out[k] = np.stack([it[k] for it in items])
        return out

    def _build_batch(self, idx, b):
        # process p takes the CONTIGUOUS rows [p*bs, (p+1)*bs) of global
        # batch b: with the mesh's data axis ordered process-major
        # (parallel/mesh.py + make_array_from_process_local_data), the
        # assembled global batch is idx[b*gbs:(b+1)*gbs] in order — EXACTLY
        # the single-process batch, so multi-process runs are step-for-step
        # equivalent to single-process runs (tests/test_multiprocess.py).
        # (torch's DistributedSampler interleaves rank::world instead; the
        # sample SET per batch is the same either way.)
        base = (b * self.process_count + self.process_index) * \
            self.batch_size
        sel = idx[base:base + self.batch_size]
        return self._collate([self.dataset[int(i)] for i in sel])

    def __iter__(self):
        idx = self._indices()
        gbs = self.batch_size * self.process_count
        nb = len(idx) // gbs if self.drop_last else -(-len(idx) // gbs)

        if self.num_workers > 1:
            # concurrent batch builders with a bounded in-flight window
            with ThreadPoolExecutor(self.num_workers) as ex:
                window = self.num_workers + self.prefetch
                futs = {b: ex.submit(self._build_batch, idx, b)
                        for b in range(min(window, nb))}
                for b in range(nb):
                    batch = futs.pop(b).result()
                    nxt = b + window
                    if nxt < nb:
                        futs[nxt] = ex.submit(self._build_batch, idx, nxt)
                    yield batch
            return

        def produce(q):
            try:
                for b in range(nb):
                    q.put(self._build_batch(idx, b))
            finally:
                q.put(None)

        q = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
