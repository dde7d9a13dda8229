"""Dataset/DataLoader/DataModule core (torch-free).

TPU-native replacement for the reference's torch ``Dataset``/``DataLoader``
+ Lightning ``LightningDataModule`` stack: datasets yield numpy dicts with
*fixed shapes* (XLA never recompiles on data), the loader collates on host
and prefetches batches on background threads, and datamodules expose the
reference's ``setup()`` + ``{train,val,test,predict}_dataloader()`` surface
(SURVEY.md §2.2).

Per-worker seeding mirrors the reference's ``worker_init_fn`` numpy reseed
(``vggsound_datamodule.py:140-142``): each epoch derives per-item seeds from
(base seed, epoch, index) so results are reproducible regardless of thread
scheduling.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class Dataset:
    """Map-style dataset: ``__len__`` + ``__getitem__(idx) -> dict``."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> dict:
        raise NotImplementedError


def default_collate(items: List[dict]) -> dict:
    """Stack numpy-able leaves on a new batch axis; lists of
    strings/objects stay lists (meta)."""
    assert items
    out: Dict[str, Any] = {}
    first = items[0]
    for key, value in first.items():
        vals = [it[key] for it in items]
        if isinstance(value, dict):
            out[key] = default_collate(vals)
        elif isinstance(value, np.ndarray) or (
            np.isscalar(value) and not isinstance(value, (str, bytes))
        ):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals
    return out


class DataLoader:
    """Batched iteration with deterministic shuffling and threaded
    prefetch. ``drop_last=True`` by default: fixed batch shapes are a
    requirement for jit (ragged tails would trigger recompiles)."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 0,
        prefetch: int = 2,
        collate_fn: Callable[[List[dict]], dict] = default_collate,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.collate_fn = collate_fn
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        batches = []
        end = n - (n % self.batch_size) if self.drop_last else n
        for i in range(0, end, self.batch_size):
            batches.append(order[i : i + self.batch_size])
        return batches

    def _load_batch(self, idxs: np.ndarray) -> dict:
        return self.collate_fn([self.dataset[int(i)] for i in idxs])

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        if self.num_workers <= 0:
            for idxs in batches:
                yield self._load_batch(idxs)
            return
        # threaded prefetch: workers pull batch indices from a queue and
        # publish results in order
        results: Dict[int, dict] = {}
        results_lock = threading.Condition()
        work: "queue.Queue" = queue.Queue()
        for i, idxs in enumerate(batches):
            work.put((i, idxs))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    i, idxs = work.get_nowait()
                except queue.Empty:
                    return
                batch = self._load_batch(idxs)
                with results_lock:
                    results[i] = batch
                    results_lock.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for i in range(len(batches)):
                with results_lock:
                    while i not in results:
                        results_lock.wait(timeout=60.0)
                    yield results.pop(i)
        finally:
            stop.set()


class DataModule:
    """Reference LightningDataModule surface (SURVEY.md §2.2)."""

    def setup(self, stage: Optional[str] = None) -> None:
        raise NotImplementedError

    def train_dataloader(self) -> DataLoader:
        raise NotImplementedError

    def val_dataloader(self) -> DataLoader:
        raise NotImplementedError

    def test_dataloader(self) -> DataLoader:
        raise NotImplementedError

    def predict_dataloader(self) -> DataLoader:
        raise NotImplementedError
