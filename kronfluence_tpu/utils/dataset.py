"""Dataset handling: batching, padding, and partitioning.

The reference relies on torch DataLoaders with three custom distributed
samplers (kronfluence/utils/dataset.py:104-199). XLA's static-shape model
makes dynamic last batches expensive (each unique shape recompiles), so the
TPU build instead *pads* every batch to a fixed global batch size and carries
a per-sample `valid` mask; every downstream statistic masks padded samples
exactly (see ops/flatten.py). This supersedes DistributedEvalSampler (no
duplication — padded rows contribute zero) and DistributedSamplerWithStack
(score columns are assembled from contiguous index ranges).

Supported dataset forms: mapping of column arrays, sequence of example
pytrees, torch Dataset, or HF datasets (anything with __len__/__getitem__).
"""

import dataclasses
import math
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class DataLoaderKwargs:
    """Loader knobs (reference: utils/dataset.py:17-35), TPU semantics:

    * `collate_fn` — honored: applied to the list of example rows to build a
      batch (default stacks numpy leaves).
    * `num_workers` / `prefetch_factor` — honored as a background prefetch
      thread: >0 workers keeps up to `prefetch_factor` materialized batches
      ahead of the dispatch loop.
    * `pin_memory` / `persistent_workers` — meaningless off torch; accepted
      and ignored (device transfers are always async through jax.device_put).
    * `drop_last` — honored: drops the final partial batch instead of padding.
    """

    num_workers: int = 0
    collate_fn: Optional[Any] = None
    pin_memory: bool = False
    drop_last: bool = False
    prefetch_factor: Optional[int] = None
    persistent_workers: bool = False


def _to_numpy(leaf: Any) -> Any:
    if isinstance(leaf, np.ndarray):
        return leaf
    if hasattr(leaf, "detach") and hasattr(leaf, "numpy"):  # torch.Tensor
        return leaf.detach().cpu().numpy()
    if hasattr(leaf, "__array__"):
        return np.asarray(leaf)
    if isinstance(leaf, (int, float, bool, np.generic)):
        return np.asarray(leaf)
    return leaf


def _is_column_store(dataset: Any) -> bool:
    return isinstance(dataset, dict) and all(
        hasattr(v, "__len__") for v in dataset.values()
    )


def dataset_length(dataset: Any) -> int:
    if _is_column_store(dataset):
        return len(next(iter(dataset.values())))
    return len(dataset)


def _is_device_column_store(dataset: Any) -> bool:
    """Column store whose columns already live on an accelerator (jax.Array).

    Batches from such a store are sliced ON DEVICE — no host materialization
    and no per-step host->device upload. Useful when the host link is slow
    (pre-upload the dataset once) or when data is produced on device."""
    if not _is_column_store(dataset):
        return False
    try:
        import jax
    except ImportError:  # pragma: no cover
        return False
    return all(isinstance(v, jax.Array) for v in dataset.values())


def _get_rows(dataset: Any, indices: np.ndarray) -> Any:
    """Materializes a batch of examples as a pytree of stacked numpy arrays
    (or device arrays for a device-resident column store)."""
    if _is_device_column_store(dataset):
        import jax

        # Multi-host runs assemble global batches from per-process numpy
        # shards (shard_batch), so only the single-process path may keep
        # batches on device (mirrors the gating in BatchLoader._batches).
        if jax.process_count() == 1:
            start, length = int(indices[0]), len(indices)
            contiguous = bool(np.array_equal(indices, np.arange(start, start + length)))
            if contiguous:
                return {k: jax.lax.dynamic_slice_in_dim(v, start, length, 0) for k, v in dataset.items()}
            return {k: v[indices] for k, v in dataset.items()}
        return {k: np.asarray(v)[indices] for k, v in dataset.items()}
    if _is_column_store(dataset):
        return {k: _to_numpy(v)[indices] for k, v in dataset.items()}
    rows = [dataset[int(i)] for i in indices]
    return _collate(rows)


def _collate(rows: List[Any]) -> Any:
    first = rows[0]
    if isinstance(first, dict):
        return {k: _collate([r[k] for r in rows]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(_collate([r[i] for r in rows]) for i in range(len(first)))
    return np.stack([np.asarray(_to_numpy(r)) for r in rows])


def make_indices_partition(total_data_examples: int, partition_size: int, target_data_partitions: Optional[Sequence[int]] = None) -> List[Tuple[int, int]]:
    """Splits [0, total) into `partition_size` contiguous (start, end) ranges.

    Matches reference `make_indices_partition` (utils/dataset.py:38-63).
    """
    if partition_size > total_data_examples:
        raise ValueError("Partition size cannot exceed the number of examples.")
    bins = np.array_split(np.arange(total_data_examples), partition_size)
    ranges = [(int(b[0]), int(b[-1]) + 1) for b in bins]
    if target_data_partitions is not None:
        ranges = [ranges[i] for i in target_data_partitions]
    return ranges


class BatchLoader:
    """Yields fixed-shape (batch, valid_mask) pairs over an index range.

    Every batch has exactly `batch_size` rows; the final batch is padded by
    repeating the first row of the range with `valid=0` (or dropped when
    `drop_last`). With `num_workers > 0` a background thread materializes
    batches ahead of the consumer so host-side collation overlaps device
    compute — the TPU analogue of the torch DataLoader worker pool.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        indices: Optional[Sequence[int]] = None,
        dataloader_kwargs: Optional[DataLoaderKwargs] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.dataloader_kwargs = dataloader_kwargs or DataLoaderKwargs()
        if indices is None:
            indices = np.arange(dataset_length(dataset))
        self.indices = np.asarray(indices, dtype=np.int64)
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive.")

    def __len__(self) -> int:
        n = len(self.indices)
        if self.dataloader_kwargs.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    @property
    def num_examples(self) -> int:
        if self.dataloader_kwargs.drop_last:
            return (len(self.indices) // self.batch_size) * self.batch_size
        return len(self.indices)

    def _materialize(self, chunk: np.ndarray) -> Any:
        collate = self.dataloader_kwargs.collate_fn
        if collate is not None:
            rows = [self.dataset[int(i)] for i in chunk]
            return collate(rows)
        return _get_rows(self.dataset, chunk)

    def _batches(self) -> Iterator[Tuple[Any, np.ndarray]]:
        import jax

        n = self.num_examples
        procs, rank = jax.process_count(), jax.process_index()
        device_store = procs == 1 and _is_device_column_store(self.dataset)
        ones_valid_dev = None
        for start in range(0, n, self.batch_size):
            chunk = self.indices[start : start + self.batch_size]
            valid = np.ones(self.batch_size, dtype=np.float32)
            if len(chunk) < self.batch_size:
                pad = self.batch_size - len(chunk)
                valid[len(chunk) :] = 0.0
                chunk = np.concatenate([chunk, np.full(pad, chunk[0], dtype=np.int64)])
            if device_store:
                # Device-resident data: keep the valid mask device-resident
                # too (the all-ones mask is shared across batches), so a step
                # costs zero host->device traffic.
                if valid.all():
                    if ones_valid_dev is None:
                        ones_valid_dev = jax.device_put(valid)
                    yield self._materialize(chunk), ones_valid_dev
                else:
                    yield self._materialize(chunk), jax.device_put(valid)
                continue
            if procs > 1:
                # Multi-host: materialize only this process's contiguous rows
                # of the global batch (shard_batch reassembles the global
                # array from the per-process shards).
                per = self.batch_size // procs
                sl = slice(rank * per, (rank + 1) * per)
                yield self._materialize(chunk[sl]), valid[sl]
            else:
                yield self._materialize(chunk), valid

    def __iter__(self) -> Iterator[Tuple[Any, np.ndarray]]:
        kwargs = self.dataloader_kwargs
        if kwargs.num_workers and kwargs.num_workers > 0:
            return _prefetched(self._batches(), kwargs.prefetch_factor or 2)
        return self._batches()

    def probe(self) -> Tuple[Any, np.ndarray]:
        """First (batch, valid) pair, without progress bars or prefetch
        threads — used by stage drivers for shape/module discovery."""
        return next(self._batches())


def _prefetched(source: Iterator, depth: int) -> Iterator:
    """Runs `source` in a daemon thread, keeping `depth` items buffered."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()

    def worker():
        try:
            for item in source:
                q.put(item)
            q.put(sentinel)
        except BaseException as exc:  # surface worker errors to the consumer
            q.put(exc)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


TQDM_BAR_FORMAT = (
    "{desc} [{bar:10}] {percentage:3.0f}% | {n_fmt}/{total_fmt} [time left: {remaining}, time spent: {elapsed}]"
)


class ProgressLoader:
    """Transparent loader wrapper adding a tqdm bar per iteration pass.

    Delegates every attribute to the wrapped loader (num_examples,
    batch_size, …) so stage drivers are oblivious. The bar is emitted only
    when enabled (main process, tqdm not disabled) — the analogue of the
    reference's main-process-gated tqdm (utils/logger.py:14-16).
    """

    def __init__(self, loader: Any, desc: str = "", disable: bool = False) -> None:
        self._loader = loader
        self._desc = desc
        self._disable = disable

    def __getattr__(self, name: str) -> Any:
        return getattr(self._loader, name)

    def __len__(self) -> int:
        return len(self._loader)

    def probe(self):
        """Probe batch without spinning up (and abandoning) a tqdm bar."""
        if hasattr(self._loader, "probe"):
            return self._loader.probe()
        return next(iter(self._loader))

    def __iter__(self):
        if self._disable:
            return iter(self._loader)
        from tqdm import tqdm

        return iter(
            tqdm(
                iter(self._loader),
                total=len(self._loader),
                desc=self._desc,
                bar_format=TQDM_BAR_FORMAT,
            )
        )


def probe_first(loader: Any) -> Tuple[Any, Any]:
    """First (batch, valid) of any loader, preferring its tqdm/prefetch-free
    `probe()` path when available."""
    if hasattr(loader, "probe"):
        return loader.probe()
    return next(iter(loader))


def dataset_metadata(dataset: Any, indices: Optional[Sequence[int]] = None) -> Dict[str, Any]:
    """Dataset fingerprint persisted next to artifacts (reference: computer.py:160-191)."""
    return {
        "type": type(dataset).__name__,
        "dataset_size": dataset_length(dataset),
        "indices": list(map(int, indices)) if indices is not None else None,
    }
