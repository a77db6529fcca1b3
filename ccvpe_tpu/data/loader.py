"""Threaded prefetching batch loader.

The reference uses torch DataLoader with num_workers<=1
(reference train_KITTI.py:93-100) - single-threaded PIL decode is its real
bottleneck. This loader decodes samples with a thread pool (PIL releases the
GIL for JPEG decode/resize), assembles NHWC numpy batches, and keeps a
bounded prefetch queue so the accelerator never waits on the host.

Per-host sharding for multi-host data parallelism: pass (shard_id,
num_shards) and each host reads a disjoint block of every global batch of
the shared per-epoch shuffle, so the assembled global batch (order included)
is identical to the single-process one.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class ThreadedLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
        indices: Optional[Sequence[int]] = None,
        shard_id: int = 0,
        num_shards: int = 1,
        collate: Optional[Callable[[List[Any]], Dict[str, np.ndarray]]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.base_indices = list(indices if indices is not None else range(len(dataset)))
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.collate = collate or default_collate
        self.epoch = 0
        # exact mid-epoch resume: drop the first N batches of the epoch's
        # deterministic shuffle without decoding them (set by the Trainer
        # from the checkpointed cursor)
        self.start_batch = 0

    def _local_count(self) -> int:
        """Exact number of samples this shard yields per epoch (must agree
        with _epoch_indices so every host runs the same number of batches -
        unequal counts deadlock the train-step collectives)."""
        gb = self.batch_size * self.num_shards
        n = len(self.base_indices) // gb * self.batch_size
        if not self.drop_last:
            tail = len(self.base_indices) % gb
            n += max(0, -(-(tail - self.shard_id) // self.num_shards))
        return n

    def __len__(self) -> int:
        n = self._local_count()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> List[int]:
        idx = list(self.base_indices)
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        if self.num_shards == 1:
            return idx
        # Shard each GLOBAL batch (num_shards * batch_size consecutive
        # indices of the shared shuffle) as contiguous per-shard blocks, so
        # the global device array assembled from the hosts' local batches
        # (mesh.shard_batch) has exactly the single-process row order -
        # multi-host step t is bit-identical to single-process step t,
        # including order-dependent per-row randomness (drop-connect noise).
        gb = self.batch_size * self.num_shards
        out = []
        for t in range(len(idx) // gb):
            base = t * gb + self.shard_id * self.batch_size
            out.extend(idx[base: base + self.batch_size])
        if not self.drop_last:
            # per-host independent eval: distribute the ragged tail
            # round-robin so every sample is seen exactly once. With
            # drop_last=True the tail is dropped on EVERY shard (matching
            # single-process drop semantics); extending it here could give
            # shard 0 a full extra local batch that survives the per-shard
            # truncation and deadlocks multi-host training collectives.
            out.extend(idx[len(idx) // gb * gb:][self.shard_id::self.num_shards])
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        self.epoch += 1
        if self.drop_last:
            indices = indices[: len(indices) // self.batch_size * self.batch_size]
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        batches = batches[self.start_batch:]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        job_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            job_q.put((bi, b))
        results: Dict[int, Any] = {}
        results_lock = threading.Lock()
        next_emit = [0]
        stop = threading.Event()

        def fetch(i: int) -> Any:
            rng = random.Random(f"{self.seed}/{self.epoch}/{i}")
            try:
                return self.dataset.__getitem__(i, rng=rng)
            except TypeError:
                return self.dataset[i]

        def worker():
            while not stop.is_set():
                try:
                    bi, batch_idx = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = self.collate([fetch(i) for i in batch_idx])
                except Exception as e:  # surface errors to the consumer
                    batch = e
                with results_lock:
                    results[bi] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(min(self.num_workers, max(1, len(batches))))]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def default_collate(samples: List[Any]) -> Dict[str, np.ndarray]:
    """Stack dataclass/dict samples field-wise into numpy batches."""
    first = samples[0]
    if hasattr(first, "__dataclass_fields__"):
        fields = first.__dataclass_fields__.keys()
        out = {}
        for f in fields:
            vals = [getattr(s, f) for s in samples]
            if isinstance(vals[0], str):
                out[f] = np.array(vals)
            else:
                out[f] = np.stack([np.asarray(v) for v in vals])
        return out
    if isinstance(first, dict):
        return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in first}
    raise TypeError(f"cannot collate {type(first)}")
