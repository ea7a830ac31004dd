"""Scanned stage loops over device-resident datasets.

On tunneled / remote TPU backends every dispatch costs several milliseconds
of host->device round-trip latency. The per-batch stage loop (slice columns,
upload the valid mask, fold the rng, launch the step) issues ~5 dispatches
per batch, which can cost 40+ ms/step — halving the throughput of the
covariance and lambda stages whose steps themselves take ~90 ms.

When the dataset already lives on the accelerator as a column store, the
whole loop body can instead run inside one jitted `lax.scan` over batch
offsets: the batch slice, valid mask, and rng fold all happen on device, so
a CHUNK of batches costs a single dispatch and zero host->device traffic.
Chunks have a fixed static length (`SCAN_CHUNK`) so only one program is ever
compiled; the final chunk is padded with all-invalid dummy batches, which
contribute exactly zero to every statistic (ops/flatten.py masks both
activations and gradients by `valid`, and counts come from the mask).

The reference has no analogue — its hook-driven loops are inherently
per-batch (kronfluence/factor/covariance.py:223-258); this is a TPU-only
latency optimization. Eligibility (single process, no mesh, contiguous
indices, default collation, device-resident columns) is decided by
`scan_plan`; ineligible loaders fall back to the per-batch path.
"""

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

import numpy as np

SCAN_CHUNK = int(os.environ.get("KF_SCAN_CHUNK", "8"))

# Canonical padded copies of device column stores, keyed by the identity of
# the store's arrays + batch size. Without this, every scan_plan call (one per
# stage, several per pipeline) materializes a fresh padded copy of the whole
# dataset on device, roughly doubling dataset HBM residency per stage. Entries
# hold strong refs to the ORIGINAL arrays too, so the ids in the key can never
# be reused while the entry lives. FIFO-bounded: stages reuse one dataset.
_PAD_CACHE: Dict[tuple, tuple] = {}
_PAD_CACHE_MAX = 4


def _padded_columns(columns: Dict[str, Any], pad_len: int) -> Dict[str, Any]:
    import jax.numpy as jnp

    key = (tuple(sorted((k, id(v)) for k, v in columns.items())), pad_len)
    hit = _PAD_CACHE.get(key)
    if hit is not None and all(hit[0][k] is v for k, v in columns.items()):
        return hit[1]
    padded = {
        k: jnp.concatenate([v, jnp.repeat(v[:1], pad_len - len(v), axis=0)], axis=0)
        for k, v in columns.items()
    }
    while len(_PAD_CACHE) >= _PAD_CACHE_MAX:
        _PAD_CACHE.pop(next(iter(_PAD_CACHE)))
    _PAD_CACHE[key] = (dict(columns), padded)
    return padded


@dataclasses.dataclass
class ScanPlan:
    """Device-resident loop plan: padded columns + per-batch valid counts."""

    columns: Dict[str, Any]  # device column store, padded to num_batches*B rows
    batch_size: int
    num_batches: int
    nvalid: np.ndarray  # (num_batches,) int32 — valid rows per batch
    base_index: int  # first dataset row of the range

    @property
    def num_examples(self) -> int:
        return int(self.nvalid.sum())


def scan_plan(loader, mesh) -> Optional[ScanPlan]:
    """Builds a ScanPlan when `loader` can be driven as an on-device scan.

    Requirements: no mesh (tunneled single-chip is where dispatch latency
    bites; meshed runs keep the per-batch path), single process, a
    device-resident column store, default collation, and a contiguous index
    range (all stage loaders built from data partitions qualify).
    """
    import jax

    from kronfluence_tpu.utils.dataset import _is_device_column_store

    if os.environ.get("KF_SCAN_DISABLE", "0") not in ("", "0"):
        return None  # explicit opt-out (A/B measurement, debugging)
    if mesh is not None or jax.process_count() != 1:
        return None
    dataset = getattr(loader, "dataset", None)
    indices = getattr(loader, "indices", None)
    batch_size = getattr(loader, "batch_size", None)
    kwargs = getattr(loader, "dataloader_kwargs", None)
    if dataset is None or indices is None or batch_size is None or kwargs is None:
        return None
    if kwargs.collate_fn is not None:
        return None
    if not _is_device_column_store(dataset):
        return None
    indices = np.asarray(indices)
    if indices.size == 0:
        return None
    base = int(indices[0])
    if not np.array_equal(indices, np.arange(base, base + indices.size)):
        return None

    n = int(loader.num_examples)  # honors drop_last
    if n <= 0:
        return None
    num_batches = n // batch_size if kwargs.drop_last else -(-n // batch_size)
    nvalid = np.full(num_batches, batch_size, dtype=np.int32)
    rem = n - (num_batches - 1) * batch_size
    nvalid[-1] = rem

    required = base + num_batches * batch_size
    columns = dict(dataset)
    col_len = len(next(iter(columns.values())))
    # Pad to a CANONICAL length that depends only on (col_len, batch_size) —
    # never on the loader's index range. The superstep executable is compiled
    # per column-store shape, so range-dependent padding would recompile
    # between a warmup slice and the full run (the r03 bench lost ~70 s to
    # exactly that: 146x32 = 4672 > 4656 rows padded a new shape mid-steady).
    # One extra batch of slack covers every contiguous sub-range, including
    # unaligned partition bases.
    pad_len = ((col_len + batch_size - 1) // batch_size + 1) * batch_size
    if required > pad_len:  # cannot happen for in-range contiguous indices
        return None
    columns = _padded_columns(columns, pad_len)
    return ScanPlan(columns, int(batch_size), num_batches, nvalid, base)


def run_scanned(
    plan: ScanPlan,
    state: Any,
    superstep: Callable[..., Any],
    chunk: Optional[int] = None,
    progress_desc: Optional[str] = None,
) -> Any:
    """Drives `state` through every batch of `plan` in fixed-size scan chunks.

    `superstep(state, columns, starts, nvalids, idxs)` must run a lax.scan of
    exactly `chunk` steps (dummy steps carry nvalid=0 and slice batch 0).
    """
    chunk = chunk or SCAN_CHUNK
    nb, B, base = plan.num_batches, plan.batch_size, plan.base_index
    chunk_starts = range(0, nb, chunk)
    bar = None
    if progress_desc is not None:
        from tqdm import tqdm

        from kronfluence_tpu.utils.dataset import TQDM_BAR_FORMAT

        bar = tqdm(total=nb, desc=progress_desc, bar_format=TQDM_BAR_FORMAT)
    try:
        for c0 in chunk_starts:
            k = min(chunk, nb - c0)
            starts = np.full(chunk, base, dtype=np.int32)
            starts[:k] = base + B * (c0 + np.arange(k, dtype=np.int32))
            nvalids = np.zeros(chunk, dtype=np.int32)
            nvalids[:k] = plan.nvalid[c0 : c0 + k]
            idxs = (c0 + np.arange(chunk)).astype(np.int32)
            state = superstep(state, plan.columns, starts, nvalids, idxs)
            if bar is not None:
                bar.update(k)
    finally:
        if bar is not None:
            bar.close()
    return state


def scanned_map_superstep(apply, batch_size: int):
    """Wraps a stateless per-batch `apply(batch, valid, *extras)` (returning a
    pytree of per-batch outputs) into a jitted fixed-length scan over device
    column slices; outputs come back stacked along a leading chunk axis.

    Returned signature: superstep(columns, starts, nvalids, *extras) -> ys
    where every leaf of `ys` has shape (chunk, ...). Dummy steps (nvalid=0)
    produce all-zero outputs (valid masking) that callers trim.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def superstep(columns, starts, nvalids, *extras):
        def body(carry, xs):
            start, nv = xs
            batch = {
                k: jax.lax.dynamic_slice_in_dim(v, start, batch_size, 0)
                for k, v in columns.items()
            }
            valid = (jnp.arange(batch_size) < nv).astype(jnp.float32)
            return carry, apply(batch, valid, *extras)

        _, ys = jax.lax.scan(body, (), (starts, nvalids))
        return ys

    return superstep


def run_scanned_map(
    plan: ScanPlan,
    superstep: Callable[..., Any],
    chunk: Optional[int] = None,
    progress_desc: Optional[str] = None,
) -> list:
    """Maps every batch of `plan` through `superstep(columns, starts, nvalids)`
    in fixed-size chunks; returns the list of per-chunk stacked outputs
    (device-resident — callers bulk-fetch and trim trailing dummy rows)."""
    chunk = chunk or SCAN_CHUNK
    nb, B, base = plan.num_batches, plan.batch_size, plan.base_index
    outs = []
    bar = None
    if progress_desc is not None:
        from tqdm import tqdm

        from kronfluence_tpu.utils.dataset import TQDM_BAR_FORMAT

        bar = tqdm(total=nb, desc=progress_desc, bar_format=TQDM_BAR_FORMAT)
    try:
        for c0 in range(0, nb, chunk):
            k = min(chunk, nb - c0)
            starts = np.full(chunk, base, dtype=np.int32)
            starts[:k] = base + B * (c0 + np.arange(k, dtype=np.int32))
            nvalids = np.zeros(chunk, dtype=np.int32)
            nvalids[:k] = plan.nvalid[c0 : c0 + k]
            outs.append(superstep(plan.columns, starts, nvalids))
            if bar is not None:
                bar.update(k)
    finally:
        if bar is not None:
            bar.close()
    return outs


def scanned_superstep(update, batch_size: int):
    """Wraps a per-batch `update(state, params, batch, valid, rng, *extras)`
    into a jitted fixed-length scan over device column slices.

    Returned signature:
        superstep(state, params, columns, starts, nvalids, idxs, base_rng,
                  *extras)
    with `state` donated. `starts`/`nvalids`/`idxs` are (chunk,) int32.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, donate_argnums=(0,))
    def superstep(state, params, columns, starts, nvalids, idxs, base_rng, *extras):
        def body(st, xs):
            start, nv, idx = xs
            batch = {
                k: jax.lax.dynamic_slice_in_dim(v, start, batch_size, 0)
                for k, v in columns.items()
            }
            valid = (jnp.arange(batch_size) < nv).astype(jnp.float32)
            rng = jax.random.fold_in(base_rng, idx)
            return update(st, params, batch, valid, rng, *extras), None

        st, _ = jax.lax.scan(body, state, (starts, nvalids, idxs))
        return st

    return superstep
