"""Host-side batching with background prefetch.

Replaces torch DataLoader + pin_memory workers (reference datamodules.py:
422-504) with a thread prefetcher: preprocessors are numpy + the Rust
tokenizer core (both release the GIL), so one producer thread overlaps host
preprocessing with TPU steps without multiprocessing.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from ..data.datasets import IterableDatasetWithLength, TableDataset


class DataLoader:
    def __init__(
        self,
        dataset,
        collator: Callable[[Dict[str, List[Any]]], Dict[str, Any]],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _column_batches(self) -> Iterator[Dict[str, List[Any]]]:
        if isinstance(self.dataset, IterableDatasetWithLength):
            columns: Dict[str, List[Any]] = {}
            count = 0
            for row in self.dataset:
                for k, v in row.items():
                    columns.setdefault(k, []).append(v)
                count += 1
                if count == self.batch_size:
                    yield columns
                    columns, count = {}, 0
            if count and not self.drop_last:
                yield columns
            return

        assert isinstance(self.dataset, TableDataset)
        n = len(self.dataset)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(indices)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            batch_idx = indices[start : start + self.batch_size]
            if self.drop_last and len(batch_idx) < self.batch_size:
                break
            yield self.dataset.slice_columns(batch_idx)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            for columns in self._column_batches():
                yield self.collator(columns)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        error: List[BaseException] = []

        def _put(item) -> bool:
            # Bounded put that notices an abandoned consumer (e.g. validate
            # breaking at limit_val_batches) so the producer thread exits
            # instead of blocking on a full queue forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for columns in self._column_batches():
                    if not _put(self.collator(columns)):
                        return
            except BaseException as exc:  # noqa: BLE001 - re-raised on consumer
                error.append(exc)
            finally:
                _put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # Runs on normal exhaustion AND on generator close (consumer
            # stopped iterating early): unblock + stop the producer.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=5.0)
        # Normal completion only (a closed generator never gets here, so an
        # early-abandoning consumer isn't hit with a stale producer error).
        if error:
            raise error[0]


def subsample_dataset(dataset, cap: int, seed: int = 0):
    """Cap validation/predict sets at ``cap`` random samples
    (reference datamodules.py:441-491)."""
    if isinstance(dataset, IterableDatasetWithLength):
        return dataset.take(min(cap, len(dataset)))
    if len(dataset) <= cap:
        return dataset
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(dataset), cap, replace=False)
    return dataset.select(idx)
