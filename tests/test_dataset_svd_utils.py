"""Unit tests for dataset utilities and low-rank SVD compression.

Mirrors reference tests/test_dataset_utils.py and tests/modules/test_matmul.py
(the SVD-reconstruction unit tests backing query batching).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kronfluence_tpu.ops.svd import lowrank_factors_full, lowrank_factors_randomized
from kronfluence_tpu.utils.dataset import (
    BatchLoader,
    DataLoaderKwargs,
    dataset_length,
    make_indices_partition,
)


# ---- make_indices_partition (reference utils/dataset.py:38-63) ----

def test_make_indices_partition_covers_everything():
    ranges = make_indices_partition(103, 4)
    assert len(ranges) == 4
    covered = []
    for start, end in ranges:
        covered.extend(range(start, end))
    assert covered == list(range(103))


def test_make_indices_partition_targets_subset():
    ranges = make_indices_partition(100, 5, target_data_partitions=[1, 3])
    assert len(ranges) == 2
    assert ranges[0] == (20, 40) and ranges[1] == (60, 80)


def test_make_indices_partition_rejects_oversized():
    with pytest.raises(ValueError):
        make_indices_partition(3, 5)


# ---- BatchLoader semantics ----

def _data(n):
    return {"x": np.arange(n, dtype=np.float64)[:, None]}


def test_batch_loader_pads_final_batch_with_invalid_rows():
    loader = BatchLoader(_data(7), 3)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    last_batch, last_valid = batches[-1]
    assert last_batch["x"].shape == (3, 1)
    np.testing.assert_array_equal(last_valid, [1.0, 0.0, 0.0])
    # padded rows repeat the first row of the final chunk
    assert last_batch["x"][1, 0] == last_batch["x"][0, 0]
    assert loader.num_examples == 7


def test_batch_loader_drop_last():
    loader = BatchLoader(_data(7), 3, dataloader_kwargs=DataLoaderKwargs(drop_last=True))
    batches = list(loader)
    assert len(batches) == 2
    assert loader.num_examples == 6
    for _, valid in batches:
        assert valid.all()


def test_batch_loader_custom_collate_fn():
    rows = list(range(10))  # sequence-style dataset

    def collate(items):
        return {"doubled": np.asarray(items, dtype=np.float64) * 2}

    loader = BatchLoader(rows, 4, dataloader_kwargs=DataLoaderKwargs(collate_fn=collate))
    batch, valid = next(iter(loader))
    np.testing.assert_array_equal(batch["doubled"], [0.0, 2.0, 4.0, 6.0])


def test_batch_loader_prefetch_thread_matches_sync():
    data = _data(20)
    sync = [b["x"] for b, _ in BatchLoader(data, 4)]
    pre = [
        b["x"]
        for b, _ in BatchLoader(
            data, 4, dataloader_kwargs=DataLoaderKwargs(num_workers=2, prefetch_factor=3)
        )
    ]
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a, b)


def test_batch_loader_indices_subset():
    loader = BatchLoader(_data(10), 2, indices=[9, 3, 5])
    batches = list(loader)
    flat = np.concatenate([b["x"][v.astype(bool)] for b, v in batches]).ravel()
    np.testing.assert_array_equal(flat, [9.0, 3.0, 5.0])
    assert dataset_length(_data(10)) == 10


# ---- Low-rank SVD (reference tests/modules/test_matmul.py:10-94) ----

def _batch_of_lowrank_matrices(q=3, o=24, i=18, true_rank=5, seed=0):
    rng = np.random.default_rng(seed)
    left = rng.normal(size=(q, o, true_rank))
    right = rng.normal(size=(q, true_rank, i))
    return jnp.asarray(left @ right)


def test_full_svd_reconstructs_exactly_at_true_rank():
    g = _batch_of_lowrank_matrices(true_rank=5)
    left, right = lowrank_factors_full(g, 5, jnp.float64)
    recon = jnp.einsum("qor,qri->qoi", left, right)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(g), rtol=1e-9, atol=1e-9)


def test_randomized_svd_reconstructs_at_true_rank():
    g = _batch_of_lowrank_matrices(true_rank=4, seed=1)
    left, right = lowrank_factors_randomized(g, 4, jnp.float64, jax.random.PRNGKey(0))
    recon = jnp.einsum("qor,qri->qoi", left, right)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(g), rtol=1e-6, atol=1e-8)


def test_truncated_svd_error_matches_optimal():
    # Truncation error of rank-k approx == sum of discarded singular values².
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(2, 16, 12)))
    k = 6
    left, right = lowrank_factors_full(g, k, jnp.float64)
    recon = jnp.einsum("qor,qri->qoi", left, right)
    err = jnp.linalg.norm((g - recon).reshape(2, -1), axis=1) ** 2
    s = jnp.linalg.svd(g, compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(jnp.sum(s[:, k:] ** 2, axis=1)), rtol=1e-8
    )
