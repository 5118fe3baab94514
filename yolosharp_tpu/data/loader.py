"""Prefetching data loader: thread-pool sample transforms + background batch
assembly feeding the jitted step functions.

Functional parity target: Data/YoloDataLoader.cs:6-45 (multi-worker shuffle
loader with custom collate). Here batches are padded static-shape numpy
dicts, assembled ahead of time in a background thread so host augmentation
overlaps device compute (the TPU analogue of the reference's worker
threads + device move).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def device_prefetch(iterable, put_fn, depth: int = 2):
    """Move batches to device `depth` steps ahead of consumption.

    `put_fn` runs on a dedicated transfer thread: on a remote/tunneled
    TPU `jax.device_put` blocks while the bytes stream over the link, so
    calling it inline would serialize transfer with step dispatch. The
    thread overlaps host->HBM traffic with BOTH the producer's host work
    and the device compute; `depth` bounds how many transferred batches
    may be in flight (device memory backpressure).
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def transfer():
        try:
            for item in iterable:
                if stop.is_set():
                    break
                q.put(put_fn(item))
        except Exception as exc:  # surface to consumer
            q.put(exc)
        finally:
            q.put(None)

    t = threading.Thread(target=transfer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 workers: int = 4, max_labels: Optional[int] = None,
                 drop_last: bool = False, prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self._max_labels = max_labels
        # device-augment: mosaic partners restricted to groups of this size
        # (set by the trainer to batch_size / mesh_devices so tiles never
        # cross data-parallel shards); 0 = whole batch
        self.partner_group = 0

    @property
    def max_labels(self) -> int:
        return self._max_labels or self.dataset.max_label_count

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                # pad the final batch by repeating its own rows: keeps the
                # batch shape static AND keeps rectangle-shape groups intact
                # (samples from other batches may have different val shapes)
                pad = self.batch_size - len(idx)
                reps = np.resize(idx, pad)
                idx = np.concatenate([idx, reps])
            yield idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        ml = self.max_labels
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.workers) as pool:
                    for idx in self._batches():
                        if stop.is_set():
                            break
                        if (hasattr(self.dataset, "use_device_augment")
                                and self.dataset.use_device_augment()):
                            # host plans, device renders: no per-sample
                            # cv2 work at all (data/device_augment.py)
                            q.put(self.dataset.device_batch(
                                idx, ml, self.partner_group))
                        else:
                            recs = list(pool.map(self.dataset.get, idx))
                            q.put(self.dataset.collate(recs, ml))
            except Exception as exc:  # surface worker errors to consumer
                q.put(exc)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
