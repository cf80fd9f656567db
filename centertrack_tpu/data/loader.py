"""Prefetching batch loader with thread or process workers.

Replaces torch DataLoader workers (reference: main.py:52-65,
--num_workers). Default mode is a thread pool: cv2 warps + JPEG decode
release the GIL and the heavy GT render already moved on-device
(data/render.py). For multi-chip global batches where the Python-side
target building itself becomes the bottleneck, ``use_processes=True``
switches to fork-based process workers (the torch-DataLoader analogue):
each item is seeded deterministically from the loader's RNG stream so
augmentation stays reproducible and workers don't duplicate draws.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

_worker_ds = None


def _proc_init(dataset):
    global _worker_ds
    _worker_ds = dataset


def _proc_get(args):
    idx, seed = args
    np.random.seed(seed)
    _worker_ds._data_rng = np.random.RandomState(
        (seed * 2654435761) % (2 ** 31 - 1))
    return _worker_ds[int(idx)]


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, seed: int = 317,
                 use_processes: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        self.use_processes = use_processes

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(indices)
        batches = []
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            if self.use_processes:
                # Pin the documented fork semantics explicitly: Python
                # 3.14 flips the default start method to forkserver,
                # which would pickle the whole dataset per pool. Note
                # fork from a process with live threads (this producer
                # thread, or an initialized JAX client) is inherently
                # deadlock-prone — create loaders before heavy JAX use
                # or prefer thread workers (the default).
                import multiprocessing
                pool = ProcessPoolExecutor(
                    self.num_workers, initializer=_proc_init,
                    initargs=(self.dataset,),
                    mp_context=multiprocessing.get_context("fork"))
                fetch = lambda chunk: pool.map(_proc_get, [
                    (i, int(self.rng.randint(1 << 31))) for i in chunk])
            else:
                pool = ThreadPoolExecutor(self.num_workers)
                fetch = lambda chunk: pool.map(
                    self.dataset.__getitem__, chunk)
            try:
                for chunk in batches:
                    if stop.is_set():
                        return
                    q.put(collate(list(fetch(chunk))))
            finally:
                pool.shutdown(wait=False, cancel_futures=True)
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
