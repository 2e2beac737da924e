"""Host-side batch loader with threaded prefetch.

Replaces the reference's 8-worker torch DataLoader fork
(train2_seq.py:531-533).  Sample decoding (JPEG, PLY parse, histogram) is
CPU-bound and GIL-releasing (PIL/NumPy), so a thread pool saturates the host
cores without process-fork overhead; batches are assembled into contiguous
NumPy arrays ready for a single sharded device_put.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator

import numpy as np

_COLLATE_KEYS = ("image", "lidar", "radar", "gps", "beam", "beamidx")


_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _getitem(i: int):
    return _WORKER_DATASET[i]


def collate(samples) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in _COLLATE_KEYS:
        if k in samples[0]:
            out[k] = np.stack([s[k] for s in samples])
    if "scenario" in samples[0]:
        out["scenario"] = np.asarray([s["scenario"] for s in samples])
    return out


class DataLoader:
    """Iterable over shuffled, collated batches.

    Args mirror the reference DataLoader surface: batch_size, shuffle,
    num_workers, drop_last.  ``seed`` reseeds the shuffle per epoch
    (epoch counter folded in, matching seeded-run reproducibility).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = False,
                 seed: int = 100, prefetch: int = 4,
                 use_processes: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        # GIL-bound decode (JPEG+PLY parsing) parallelizes poorly on
        # threads; process workers match the reference's 8-fork DataLoader
        # for the cold (non-cached) path. The dataset must be picklable.
        self.use_processes = use_processes
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self.epoch += 1
        if self.use_processes:
            pool = cf.ProcessPoolExecutor(self.num_workers,
                                          initializer=_init_worker,
                                          initargs=(self.dataset,))
        else:
            pool = cf.ThreadPoolExecutor(self.num_workers)
        with pool:
            batch_iter = self._batches()

            def submit_batch(indices):
                if self.use_processes:
                    return [pool.submit(_getitem, int(i)) for i in indices]
                return [pool.submit(self.dataset.__getitem__, int(i))
                        for i in indices]

            inflight = []
            for _ in range(self.prefetch):
                ids = next(batch_iter, None)
                if ids is None:
                    break
                inflight.append(submit_batch(ids))
            while inflight:
                futures = inflight.pop(0)
                ids = next(batch_iter, None)
                if ids is not None:
                    inflight.append(submit_batch(ids))
                yield collate([f.result() for f in futures])
