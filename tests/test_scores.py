"""Score-stage correctness tests.

Mirrors the reference's equivalence-test matrix (SURVEY.md §4): explicit-oracle
checks, batch-size invariance, per-module vs summed, accumulation invariance,
aggregated gradients vs explicit sums, self vs diagonal-of-pairwise, and
low-rank query batching correlation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
from kronfluence_tpu.factor.eigen import (
    fit_lambda_matrices_with_loader,
    perform_eigendecomposition,
)
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.score.self_scores import compute_self_scores_with_loaders
from kronfluence_tpu.utils.constants import ALL_MODULE_NAME
from kronfluence_tpu.utils.dataset import BatchLoader

from tests.testable_tasks.regression import (
    RegressionTask,
    make_mlp,
    make_regression_data,
)

FP64_FACTOR = dict(
    use_empirical_fisher=True,
    activation_covariance_dtype="float64",
    gradient_covariance_dtype="float64",
    per_sample_gradient_dtype="float64",
    lambda_dtype="float64",
)
FP64_SCORE = dict(
    score_dtype="float64",
    per_sample_gradient_dtype="float64",
    precondition_dtype="float64",
    query_gradient_svd_dtype="float64",
)


class IdenticalMeasurementTask(RegressionTask):
    """Measurement == train loss, so self == diag(pairwise) on same data."""

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model, sample=False)


def _fit_factors(model, params, task, data, strategy="ekfac", batch_size=5):
    args = FactorArguments(strategy=strategy, **FP64_FACTOR)
    factors = {}
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, batch_size), args
    )
    factors.update(cov)
    if strategy in ("kfac", "ekfac"):
        eigen = perform_eigendecomposition(cov, args)
        factors.update(eigen)
    else:
        eigen = None
    if strategy in ("diagonal", "ekfac"):
        lam = fit_lambda_matrices_with_loader(
            model, params, task, BatchLoader(data, batch_size), args, eigen_factors=eigen
        )
        factors.update(lam)
    return factors, args


def _pairwise(model, params, task, factors, factor_args, query, train,
              qbs=4, tbs=5, **score_kwargs):
    merged = {**FP64_SCORE, **score_kwargs}
    score_args = ScoreArguments(damping_factor=1e-8, **merged)
    return compute_pairwise_scores_with_loaders(
        model, params, task,
        BatchLoader(query, qbs), BatchLoader(train, tbs),
        factors, factor_args, score_args,
    )


@pytest.fixture(scope="module")
def setup():
    model, params, task = make_mlp()
    train = make_regression_data(12, seed=0)
    query = make_regression_data(5, seed=1)
    factors, factor_args = _fit_factors(model, params, task, train)
    return model, params, task, train, query, factors, factor_args


def test_pairwise_batch_size_invariance(setup):
    model, params, task, train, query, factors, fargs = setup
    base = _pairwise(model, params, task, factors, fargs, query, train, qbs=5, tbs=12)
    for qbs, tbs in [(1, 1), (2, 5), (4, 7)]:
        other = _pairwise(model, params, task, factors, fargs, query, train, qbs=qbs, tbs=tbs)
        np.testing.assert_allclose(
            base[ALL_MODULE_NAME], other[ALL_MODULE_NAME], rtol=1e-8, atol=1e-10,
            err_msg=f"qbs={qbs} tbs={tbs}",
        )


def test_per_module_scores_sum_to_total(setup):
    model, params, task, train, query, factors, fargs = setup
    total = _pairwise(model, params, task, factors, fargs, query, train)
    per_module = _pairwise(
        model, params, task, factors, fargs, query, train, compute_per_module_scores=True
    )
    assert ALL_MODULE_NAME not in per_module and len(per_module) == 3
    summed = sum(per_module.values())
    np.testing.assert_allclose(total[ALL_MODULE_NAME], summed, rtol=1e-8, atol=1e-10)


def test_query_accumulation_invariance(setup):
    model, params, task, train, query, factors, fargs = setup
    base = _pairwise(model, params, task, factors, fargs, query, train, qbs=5)
    accum = _pairwise(
        model, params, task, factors, fargs, query, train,
        qbs=1, query_gradient_accumulation_steps=3,
    )
    np.testing.assert_allclose(base[ALL_MODULE_NAME], accum[ALL_MODULE_NAME],
                               rtol=1e-8, atol=1e-10)


def test_low_rank_with_accumulation_invariance(setup):
    """Low-rank compression composed with query accumulation (per-chunk query
    blocks): per-query SVDs are independent of chunk boundaries, so results
    must equal the single-batch low-rank run exactly."""
    model, params, task, train, query, factors, fargs = setup
    base = _pairwise(
        model, params, task, factors, fargs, query, train,
        qbs=5, query_gradient_low_rank=8, use_full_svd=True,
    )
    accum = _pairwise(
        model, params, task, factors, fargs, query, train,
        qbs=1, query_gradient_accumulation_steps=3,
        query_gradient_low_rank=8, use_full_svd=True,
    )
    np.testing.assert_allclose(base[ALL_MODULE_NAME], accum[ALL_MODULE_NAME],
                               rtol=1e-8, atol=1e-10)


def test_aggregated_query_gradients_equal_summed_scores(setup):
    model, params, task, train, query, factors, fargs = setup
    base = _pairwise(model, params, task, factors, fargs, query, train)
    agg = _pairwise(
        model, params, task, factors, fargs, query, train, aggregate_query_gradients=True
    )
    assert agg[ALL_MODULE_NAME].shape == (1, 12)
    np.testing.assert_allclose(
        agg[ALL_MODULE_NAME][0], base[ALL_MODULE_NAME].sum(axis=0), rtol=1e-8, atol=1e-9
    )


def test_aggregated_train_gradients_equal_summed_scores(setup):
    model, params, task, train, query, factors, fargs = setup
    base = _pairwise(model, params, task, factors, fargs, query, train)
    agg = _pairwise(
        model, params, task, factors, fargs, query, train, aggregate_train_gradients=True
    )
    assert agg[ALL_MODULE_NAME].shape == (5, 1)
    np.testing.assert_allclose(
        agg[ALL_MODULE_NAME][:, 0], base[ALL_MODULE_NAME].sum(axis=1), rtol=1e-8, atol=1e-9
    )


@pytest.mark.parametrize("use_measurement", [False, True])
def test_self_scores_equal_pairwise_diagonal(use_measurement):
    model, params, _ = make_mlp()
    task = IdenticalMeasurementTask()
    train = make_regression_data(10, seed=3)
    factors, fargs = _fit_factors(model, params, task, train)
    score_args = ScoreArguments(
        damping_factor=1e-8,
        use_measurement_for_self_influence=use_measurement,
        **FP64_SCORE,
    )
    self_scores = compute_self_scores_with_loaders(
        model, params, task, BatchLoader(train, 5), factors, fargs, score_args
    )
    pairwise = _pairwise(model, params, task, factors, fargs, train, train, qbs=5, tbs=5)
    np.testing.assert_allclose(
        self_scores[ALL_MODULE_NAME],
        np.diag(pairwise[ALL_MODULE_NAME]),
        rtol=1e-8,
        atol=1e-10,
    )


@pytest.mark.parametrize("use_full_svd", [False, True])
def test_low_rank_query_batching_high_correlation(setup, use_full_svd):
    model, params, task, train, query, factors, fargs = setup
    base = _pairwise(model, params, task, factors, fargs, query, train)
    lowrank = _pairwise(
        model, params, task, factors, fargs, query, train,
        query_gradient_low_rank=8, use_full_svd=use_full_svd,
    )
    a = base[ALL_MODULE_NAME].ravel()
    b = lowrank[ALL_MODULE_NAME].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


@pytest.mark.parametrize("strategy", ["identity", "diagonal", "kfac"])
def test_all_strategies_produce_scores(strategy):
    model, params, task = make_mlp()
    train = make_regression_data(8, seed=5)
    query = make_regression_data(3, seed=6)
    factors, fargs = _fit_factors(model, params, task, train, strategy=strategy)
    scores = _pairwise(model, params, task, factors, fargs, query, train, qbs=3, tbs=4)
    assert scores[ALL_MODULE_NAME].shape == (3, 8)
    assert np.all(np.isfinite(scores[ALL_MODULE_NAME]))


def test_identity_scores_are_plain_gradient_dots():
    model, params, task = make_mlp()
    train = make_regression_data(6, seed=7)
    query = make_regression_data(3, seed=8)
    factors, fargs = _fit_factors(model, params, task, train, strategy="identity")
    scores = _pairwise(model, params, task, factors, fargs, query, train, qbs=3, tbs=6)

    def loss_one(params, x, y):
        return task.compute_train_loss({"x": x[None], "y": y[None]}, model.bind(params))

    def meas_one(params, x, y):
        return task.compute_measurement({"x": x[None], "y": y[None]}, model.bind(params))

    g_t = jax.vmap(jax.grad(loss_one), in_axes=(None, 0, 0))(
        params, jnp.asarray(train["x"]), jnp.asarray(train["y"])
    )
    g_q = jax.vmap(jax.grad(meas_one), in_axes=(None, 0, 0))(
        params, jnp.asarray(query["x"]), jnp.asarray(query["y"])
    )
    flat_t = np.concatenate(
        [np.asarray(x).reshape(6, -1) for x in jax.tree_util.tree_leaves(g_t)], axis=1
    )
    flat_q = np.concatenate(
        [np.asarray(x).reshape(3, -1) for x in jax.tree_util.tree_leaves(g_q)], axis=1
    )
    expected = flat_q @ flat_t.T
    np.testing.assert_allclose(scores[ALL_MODULE_NAME], expected, rtol=1e-8, atol=1e-10)
