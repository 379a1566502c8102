"""Threaded data loader with device prefetch.

TPU-native replacement for the reference's torch DataLoader + side-stream
CUDA Prefetcher (`dataset/helper/prefetcher.py:11-62`): worker threads run
the host-side load/augment pipeline; collated numpy batches are
`jax.device_put` ahead of consumption (double-buffered) so host→HBM copy
overlaps the previous step's compute — the same overlap the reference gets
from its side CUDA stream.
"""

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    """dataset: must expose load(idx, rng) + collate(items).

    iter_per_update > 1 stacks microbatches on a leading axis (reference
    `collate_fn.py:93-111` split)."""

    def __init__(self, dataset, sampler, batch_size: int,
                 num_workers: int = 2, iter_per_update: int = 1,
                 drop_last: bool = False, seed: int = 0,
                 device_put: Optional[Callable] = None):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.iter_per_update = iter_per_update
        self.drop_last = drop_last
        self.seed = seed
        self.device_put = device_put
        assert batch_size % iter_per_update == 0

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            while len(batch) < self.batch_size:  # pad to fixed shape
                batch.append(batch[len(batch) % len(batch) - 1])
            yield batch

    def __iter__(self) -> Iterator:
        out_q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def producer():
            try:
                for bi, indices in enumerate(self._batches()):
                    if stop.is_set():
                        break
                    rng = np.random.RandomState(
                        self.seed * 100003 + bi * 1009 + getattr(
                            self.sampler, "epoch", 0))
                    items = [self.dataset.load(i, rng) for i in indices]
                    batch = self.dataset.collate(items)
                    batch = self._reshape_microbatches(batch)
                    if self.device_put is not None:
                        meta = batch.pop("meta", None)
                        batch = self.device_put(batch)
                        if meta is not None:
                            batch["meta"] = meta
                    out_q.put(batch)
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()

    def _reshape_microbatches(self, batch):
        a = self.iter_per_update
        mb = self.batch_size // a

        if a == 1:
            # single microbatch: uniform leading A=1 dim on every array
            def split(x):
                return x[None] if isinstance(x, np.ndarray) else x
        else:
            # voxel batches: every sample occupies a fixed max_voxel_num
            # block (pad_voxels), so the (B*MV, ...) arrays split evenly
            # into (A, MB*MV, ...); the batch prefix in coordinates is
            # remapped from the global sample index to the within-microbatch
            # index (padding rows keep -1). Reference split semantics:
            # `collate_fn.py:115-196`.
            nvox = (batch["voxels"].shape[0] // self.batch_size
                    if "voxels" in batch else 0)

            def split(x):
                if not isinstance(x, np.ndarray):
                    return x
                if x.shape[0] == self.batch_size:
                    return x.reshape((a, mb) + x.shape[1:])
                if nvox and x.shape[0] == self.batch_size * nvox:
                    return x.reshape((a, mb * nvox) + x.shape[1:])
                return x

        out = {}
        for k, v in batch.items():
            if k in ("meta", "grid_shape", "batch_size"):
                out[k] = v
            elif isinstance(v, dict):
                out[k] = {kk: split(vv) for kk, vv in v.items()}
            else:
                out[k] = split(v)
        if a > 1 and "coordinates" in out:
            c = out["coordinates"]
            out["coordinates"] = np.concatenate(
                [np.where(c[..., :1] >= 0, c[..., :1] % mb, -1), c[..., 1:]],
                axis=-1)
        return out
