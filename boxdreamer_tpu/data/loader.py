"""Batching and loading.

Equivalent of the reference's loader stack (src/datasets/{batch_samplers,
concat_dataset,data_loader}.py): batch collation of the numpy batch dicts,
a dynamic-length batch sampler that rescales batch size to keep the B*T
token budget constant, a concat dataset, and a threaded prefetching loader
(replacing torch DataLoader worker processes).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_META_KEYS = {"original_images", "model_path", "dataset", "cat"}


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack a list of per-sample dicts into a batch dict. Non-array metadata
    keys become lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _META_KEYS or isinstance(vals[0], (str, list)):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class ConcatDataset:
    """Concatenation of datasets (reference concat_dataset.py:14-92)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        ds_idx = int(np.searchsorted(self._offsets[1:], idx, side="right"))
        return self.datasets[ds_idx][idx - int(self._offsets[ds_idx])]


class DynamicBatchSampler:
    """Variable sequence-length batching with constant token budget
    (reference batch_samplers.py:14-78): for each batch, draw a length L in
    [min_len, max_len] and use batch size round(base_batch * base_len / L).
    The dataset must honor `set_length` before `__getitem__`."""

    def __init__(
        self,
        dataset_len: int,
        base_batch_size: int,
        base_length: int,
        min_length: int,
        max_length: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset_len = dataset_len
        self.base_batch_size = base_batch_size
        self.base_length = base_length
        self.min_length = min_length
        self.max_length = max_length
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[tuple[int, List[int]]]:
        order = np.arange(self.dataset_len)
        if self.shuffle:
            self._rng.shuffle(order)
        i = 0
        while i < len(order):
            L = int(self._rng.integers(self.min_length, self.max_length + 1))
            bs = max(1, round(self.base_batch_size * self.base_length / L))
            batch = order[i : i + bs].tolist()
            i += bs
            if self.drop_last and len(batch) < bs:
                break
            yield L, batch


class DynamicLengthLoader:
    """Loader over a DynamicBatchSampler: each batch shares one sequence
    length L, with batch size rescaled to keep the B*T token budget
    (reference make_dataloader + DynamicBatchSampler + the dynamic concat
    dataset, data_loader.py:13-56)."""

    def __init__(
        self,
        dataset,
        base_batch_size: int,
        base_length: int,
        min_length: int,
        max_length: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.sampler = DynamicBatchSampler(
            len(dataset), base_batch_size, base_length, min_length, max_length,
            shuffle=shuffle, seed=seed, drop_last=drop_last,
        )

    def __iter__(self):
        for L, idxs in self.sampler:
            yield collate([self.dataset.get_item(i, n_total=L) for i in idxs])


class DataLoader:
    """Minimal threaded prefetch loader (replaces torch DataLoader;
    reference data_loader.py:13-56)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 0,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        shard_across_processes: bool = False,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        # Multi-host data sharding (the DistributedSampler-equivalent the
        # reference gets from Lightning DDP): each process iterates samples
        # process_index::process_count so a pod doesn't re-read the full
        # dataset on every host. Shuffling stays consistent across processes
        # (same seed -> same global order -> disjoint strides).
        self.shard_across_processes = shard_across_processes
        if shard_across_processes:
            import jax

            self._proc = (
                jax.process_index() if process_index is None else process_index
            )
            self._nproc = (
                jax.process_count() if process_count is None else process_count
            )
        else:
            self._proc, self._nproc = 0, 1

    def _local_len(self) -> int:
        n = len(self.dataset)
        if self._nproc > 1:
            n = (n - self._proc + self._nproc - 1) // self._nproc
        return n

    def __len__(self):
        n = self._local_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        if self._nproc > 1:
            order = order[self._proc :: self._nproc]
        batches = [
            order[i : i + self.batch_size].tolist()
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers <= 0:
            for idxs in batches:
                yield collate([self.dataset[i] for i in idxs])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for idxs in batches:
                    q.put(collate([self.dataset[i] for i in idxs]))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
