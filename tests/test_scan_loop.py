"""Scanned stage-loop equivalence: the on-device lax.scan fast path
(utils/scan_loop.py) must produce the same factors as the per-batch path.

The scan path activates only for device-resident column stores without a
mesh; these tests drive both paths over identical data and compare.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
from kronfluence_tpu.factor.eigen import (
    fit_lambda_matrices_with_loader,
    perform_eigendecomposition,
)
from kronfluence_tpu.utils.constants import (
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    LAMBDA_MATRIX_NAME,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
    NUM_LAMBDA_PROCESSED,
)
from kronfluence_tpu.utils.dataset import BatchLoader, DataLoaderKwargs
from kronfluence_tpu.utils.scan_loop import run_scanned, scan_plan
from tests.testable_tasks.regression import make_mlp, make_regression_data


def _device_store(data):
    return {k: jnp.asarray(v) for k, v in data.items()}


def _assert_tree_close(a, b, rtol=1e-6, atol=1e-8):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol)


class TestScanPlan:
    def test_host_store_is_ineligible(self):
        data = make_regression_data(10)
        assert scan_plan(BatchLoader(data, 4), mesh=None) is None

    def test_device_store_is_eligible(self):
        data = _device_store(make_regression_data(10))
        plan = scan_plan(BatchLoader(data, 4), mesh=None)
        assert plan is not None
        assert plan.num_batches == 3
        assert plan.nvalid.tolist() == [4, 4, 2]
        assert plan.num_examples == 10
        # columns padded to num_batches * batch_size rows
        assert all(len(v) >= 12 for v in plan.columns.values())

    def test_collate_fn_is_ineligible(self):
        data = _device_store(make_regression_data(10))
        kwargs = DataLoaderKwargs(collate_fn=lambda rows: rows)
        assert scan_plan(BatchLoader(data, 4, dataloader_kwargs=kwargs), mesh=None) is None

    def test_noncontiguous_indices_are_ineligible(self):
        data = _device_store(make_regression_data(10))
        loader = BatchLoader(data, 4, indices=[0, 2, 4, 6])
        assert scan_plan(loader, mesh=None) is None

    def test_contiguous_offset_range_is_eligible(self):
        data = _device_store(make_regression_data(10))
        plan = scan_plan(BatchLoader(data, 3, indices=range(3, 9)), mesh=None)
        assert plan is not None
        assert plan.base_index == 3
        assert plan.num_batches == 2

    def test_drop_last(self):
        data = _device_store(make_regression_data(10))
        kwargs = DataLoaderKwargs(drop_last=True)
        plan = scan_plan(BatchLoader(data, 4, dataloader_kwargs=kwargs), mesh=None)
        assert plan.num_batches == 2
        assert plan.nvalid.tolist() == [4, 4]

    def test_padded_store_shape_is_range_independent(self):
        """The padded column-store shape (= the superstep's compiled program
        shape) must depend only on (dataset length, batch size) — a warmup
        index-slice, the full range, and an unaligned partition range must all
        share ONE executable. The r03 full bench paid a ~70 s mid-steady
        recompile because 146x32 = 4672 > 4656 rows re-padded the store."""
        data = _device_store(make_regression_data(100))
        full = scan_plan(BatchLoader(data, 32), mesh=None)
        warm = scan_plan(BatchLoader(data, 32, indices=range(64)), mesh=None)
        part = scan_plan(BatchLoader(data, 32, indices=range(95, 100)), mesh=None)
        shapes = [
            {k: v.shape for k, v in p.columns.items()} for p in (full, warm, part)
        ]
        assert shapes[0] == shapes[1] == shapes[2]
        # slack covers every contiguous range: required rows never exceed pad
        for p in (full, warm, part):
            need = p.base_index + p.num_batches * p.batch_size
            assert all(len(v) >= need for v in p.columns.values())

    def test_padded_store_is_cached_per_dataset(self):
        """Repeated scan_plan calls on the same device column store must reuse
        ONE padded copy (the padded store co-resides with the original for a
        whole stage; re-copying per call doubled dataset HBM residency —
        r03 advisor finding)."""
        data = _device_store(make_regression_data(100))
        plans = [
            scan_plan(BatchLoader(data, 32), mesh=None),
            scan_plan(BatchLoader(data, 32, indices=range(64)), mesh=None),
            scan_plan(BatchLoader(data, 32), mesh=None),
        ]
        for k in data:
            assert plans[0].columns[k] is plans[1].columns[k]
            assert plans[0].columns[k] is plans[2].columns[k]
        # A different batch size pads to a different canonical length -> a
        # distinct entry, not a wrong reuse.
        other = scan_plan(BatchLoader(data, 7), mesh=None)
        k0 = next(iter(data))
        assert other.columns[k0] is not plans[0].columns[k0]
        assert other.columns[k0].shape[0] != plans[0].columns[k0].shape[0]

    def test_run_scanned_pads_final_chunk_with_dummies(self):
        data = _device_store(make_regression_data(10))
        plan = scan_plan(BatchLoader(data, 4), mesh=None)
        seen = []

        def fake_superstep(state, columns, starts, nvalids, idxs):
            seen.append((starts.tolist(), nvalids.tolist(), idxs.tolist()))
            return state

        run_scanned(plan, {}, fake_superstep, chunk=2)
        assert seen[0] == ([0, 4], [4, 4], [0, 1])
        # final chunk: one real batch + one dummy (nvalid 0, slices batch 0)
        assert seen[1] == ([8, 0], [2, 0], [2, 3])


@pytest.mark.parametrize("num", [10, 12])
def test_covariance_scan_matches_per_batch(num):
    model, params, task = make_mlp()
    data = make_regression_data(num)
    args = FactorArguments()

    host = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 4), args
    )
    dev = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(_device_store(data), 4), args
    )
    for fname in (
        ACTIVATION_COVARIANCE_MATRIX_NAME,
        GRADIENT_COVARIANCE_MATRIX_NAME,
        NUM_ACTIVATION_COVARIANCE_PROCESSED,
    ):
        _assert_tree_close(host[fname], dev[fname])


def test_covariance_scan_respects_index_range():
    model, params, task = make_mlp()
    data = make_regression_data(12)
    args = FactorArguments(use_empirical_fisher=True)

    sub = {k: v[3:9] for k, v in data.items()}
    host = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(sub, 3), args
    )
    dev = fit_covariance_matrices_with_loader(
        model, params, task,
        BatchLoader(_device_store(data), 3, indices=range(3, 9)), args,
    )
    _assert_tree_close(
        host[ACTIVATION_COVARIANCE_MATRIX_NAME], dev[ACTIVATION_COVARIANCE_MATRIX_NAME]
    )


def _fit_ekfac(model, params, task, data, args):
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 4), args
    )
    eig = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, 4), args, eigen_factors=eig
    )
    return {**cov, **eig, **lam}


@pytest.mark.parametrize("per_token", [False, True])
def test_pairwise_train_scan_matches_per_batch(per_token):
    from kronfluence_tpu.arguments import ScoreArguments
    from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders

    model, params, task = make_mlp()
    train = make_regression_data(11)
    query = make_regression_data(5, seed=1)
    args = FactorArguments(use_empirical_fisher=True)
    factors = _fit_ekfac(model, params, task, train, args)
    score_args = ScoreArguments(
        damping_factor=1e-8, compute_per_token_scores=per_token
    )

    host = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(query, 3), BatchLoader(train, 4),
        factors, args, score_args,
    )
    dev = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(query, 3),
        BatchLoader(_device_store(train), 4), factors, args, score_args,
    )
    _assert_tree_close(host, dev, rtol=1e-5, atol=1e-6)


def test_self_scan_matches_per_batch():
    from kronfluence_tpu.arguments import ScoreArguments
    from kronfluence_tpu.score.self_scores import compute_self_scores_with_loaders

    model, params, task = make_mlp()
    train = make_regression_data(11)
    args = FactorArguments(use_empirical_fisher=True)
    factors = _fit_ekfac(model, params, task, train, args)
    score_args = ScoreArguments(damping_factor=1e-8)

    host = compute_self_scores_with_loaders(
        model, params, task, BatchLoader(train, 4), factors, args, score_args
    )
    dev = compute_self_scores_with_loaders(
        model, params, task, BatchLoader(_device_store(train), 4), factors, args,
        score_args,
    )
    _assert_tree_close(host, dev, rtol=1e-5, atol=1e-6)


def test_lambda_scan_matches_per_batch():
    model, params, task = make_mlp()
    data = make_regression_data(11)
    args = FactorArguments()

    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 4), args
    )
    eig = perform_eigendecomposition(cov, args)
    host = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, 4), args, eigen_factors=eig
    )
    dev = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(_device_store(data), 4), args,
        eigen_factors=eig,
    )
    _assert_tree_close(host[LAMBDA_MATRIX_NAME], dev[LAMBDA_MATRIX_NAME])
    _assert_tree_close(host[NUM_LAMBDA_PROCESSED], dev[NUM_LAMBDA_PROCESSED])
