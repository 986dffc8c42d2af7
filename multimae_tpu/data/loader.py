"""Host-side data loading: grain DataLoader over the folder datasets.

Replaces the reference's torch DataLoader + DistributedSampler
(run_pretraining_multimae.py:341-361): each JAX process reads its shard
of the index space (grain ShardOptions == DistributedSampler semantics),
decodes/augments in worker processes, and yields stacked numpy batches
ready for `shard_batch` onto the device mesh.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

import grain.python as grain


class _LoadAndAugment(grain.RandomMapTransform):
    def __init__(self, dataset, transform: Optional[Callable]):
        self._dataset = dataset
        self._transform = transform

    def _load(self, index: int, rng: np.random.Generator):
        """Corrupt-file retry with a random resample (reference
        utils/dataset_folder.py:166-173). load_raw bypasses the dataset's
        own __getitem__ retry loop, so the retry must live here — and it
        draws the resample index from the per-record grain rng, keeping
        batches deterministic for a given seed even across worker counts
        (the dataset's loop uses the global `random`, which worker
        processes don't share)."""
        has_raw = hasattr(self._dataset, "load_raw")
        for _ in range(20):
            try:
                return (self._dataset.load_raw(index) if has_raw
                        else self._dataset[index])
            except Exception as e:
                print(f"[loader] sample {index} failed ({e}); resampling")
                index = int(rng.integers(0, len(self._dataset)))
        raise RuntimeError(
            "20 consecutive corrupt samples — dataset looks damaged")

    def random_map(self, index: int, rng: np.random.Generator):
        sample, target = self._load(index, rng)
        if self._transform is not None:
            py_rng = random.Random(int(rng.integers(0, 2**63 - 1)))
            try:
                sample = self._transform(sample, rng=py_rng)
            except TypeError:
                sample = self._transform(sample)
        if isinstance(sample, dict):
            sample = dict(sample)
            sample["label"] = np.asarray(target, np.int32)
            return sample
        return {"image": np.asarray(sample), "label": np.asarray(target, np.int32)}


def build_loader(
    dataset,
    transform: Optional[Callable],
    *,
    global_batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 8,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (or num_epochs) iterator of host-local numpy batches.

    The per-host batch is global_batch_size / process_count; grain shards
    the index space across processes like DistributedSampler did across
    ranks.
    """
    per_host = global_batch_size // jax.process_count()
    index_range = len(dataset)
    sampler = grain.IndexSampler(
        num_records=index_range,
        shard_options=grain.ShardOptions(
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
            drop_remainder=True,
        ),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=_IndexSource(index_range),
        sampler=sampler,
        operations=[
            _LoadAndAugment(dataset, transform),
            grain.Batch(batch_size=per_host, drop_remainder=drop_remainder),
        ],
        worker_count=worker_count,
    )
    return iter(loader)


class _IndexSource(grain.RandomAccessDataSource):
    """Yields the record index itself; decoding happens in the transform
    (keeps heavy PIL objects out of the grain record pickling path)."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, index: int) -> int:
        return index

    def __repr__(self) -> str:
        # stable repr: grain validates iterator checkpoints against
        # repr(data_source), so it must not embed an object id.
        return f"_IndexSource(n={self._n})"


def steps_per_epoch(dataset_len: int, global_batch_size: int) -> int:
    return dataset_len // global_batch_size
