"""Factor-stage correctness: covariance / eigendecomposition / lambda.

Oracle pattern #2 from the reference test strategy (SURVEY.md §4): results
must be identical across batch sizes (including padded final batches) and must
match explicit numpy recomputations from per-sample gradients.
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
    ACTIVATION_EIGENVALUES_NAME,
    ACTIVATION_EIGENVECTORS_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    GRADIENT_EIGENVALUES_NAME,
    GRADIENT_EIGENVECTORS_NAME,
    LAMBDA_MATRIX_NAME,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
    NUM_LAMBDA_PROCESSED,
)
from kronfluence_tpu.utils.dataset import BatchLoader

from tests.test_capture import oracle_per_sample_gradients
from tests.testable_tasks.regression import make_mlp, make_regression_data

FP64_ARGS = dict(
    use_empirical_fisher=True,
    activation_covariance_dtype="float64",
    gradient_covariance_dtype="float64",
    per_sample_gradient_dtype="float64",
    lambda_dtype="float64",
)

RTOL, ATOL = 1.3e-6, 1e-8


def _fit_covariance(batch_size, num=10):
    model, params, task = make_mlp()
    data = make_regression_data(num)
    loader = BatchLoader(data, batch_size)
    args = FactorArguments(strategy="ekfac", **FP64_ARGS)
    return (
        fit_covariance_matrices_with_loader(model, params, task, loader, args),
        (model, params, task, data),
    )


def test_covariance_matches_explicit_oracle():
    factors, (model, params, task, data) = _fit_covariance(batch_size=5)
    # Oracle: recompute A^T A from explicitly evaluated activations.
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    x = np.asarray(batch["x"])
    a0 = np.concatenate([x, np.ones((len(x), 1))], axis=-1)
    expected = a0.T @ a0
    first = sorted(factors[ACTIVATION_COVARIANCE_MATRIX_NAME])[0]
    got = factors[ACTIVATION_COVARIANCE_MATRIX_NAME][first]
    np.testing.assert_allclose(got, expected, rtol=RTOL, atol=ATOL)
    assert int(factors[NUM_ACTIVATION_COVARIANCE_PROCESSED][first][0]) == len(x)


@pytest.mark.parametrize("batch_size", [1, 3, 10])
def test_covariance_batch_size_invariance(batch_size):
    """bs=3 exercises a padded final batch (10 % 3 != 0)."""
    base, _ = _fit_covariance(batch_size=5)
    other, _ = _fit_covariance(batch_size=batch_size)
    for factor_name in base:
        for module_name in base[factor_name]:
            np.testing.assert_allclose(
                base[factor_name][module_name],
                other[factor_name][module_name],
                rtol=RTOL,
                atol=ATOL,
                err_msg=f"{factor_name}/{module_name} bs={batch_size}",
            )


def test_eigendecomposition_reconstructs_covariance():
    factors, _ = _fit_covariance(batch_size=5)
    args = FactorArguments(strategy="ekfac", **FP64_ARGS)
    eigen = perform_eigendecomposition(factors, args)
    for module_name, cov in factors[ACTIVATION_COVARIANCE_MATRIX_NAME].items():
        count = float(factors[NUM_ACTIVATION_COVARIANCE_PROCESSED][module_name][0])
        normalized = np.asarray(cov, np.float64) / count
        normalized = 0.5 * (normalized + normalized.T)
        q = eigen[ACTIVATION_EIGENVECTORS_NAME][module_name]
        lam = eigen[ACTIVATION_EIGENVALUES_NAME][module_name]
        np.testing.assert_allclose(q @ np.diag(lam) @ q.T, normalized, rtol=1e-6, atol=1e-9)
        # Orthonormality.
        np.testing.assert_allclose(q.T @ q, np.eye(q.shape[0]), atol=1e-10)


def _fit_lambda(batch_size, shared=False, strategy="ekfac", num=10):
    model, params, task = make_mlp(shared=shared)
    data = make_regression_data(num)
    args = FactorArguments(strategy=strategy, **FP64_ARGS)
    eigen = None
    if strategy in ("ekfac", "kfac"):
        cov = fit_covariance_matrices_with_loader(
            model, params, task, BatchLoader(data, batch_size), args
        )
        eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, batch_size), args, eigen_factors=eigen
    )
    return lam, eigen, (model, params, task, data)


@pytest.mark.parametrize("shared", [False, True])
def test_lambda_matches_oracle(shared):
    lam, eigen, (model, params, task, data) = _fit_lambda(batch_size=5, shared=shared)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    oracle = oracle_per_sample_gradients(model, params, task, batch)

    flat = {}

    def walk(tree, prefix):
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, path)
            else:
                flat[path] = np.asarray(value)

    walk(oracle, "")

    for module_name in lam[LAMBDA_MATRIX_NAME]:
        kernel = flat[f"{module_name}/kernel"].transpose(0, 2, 1)
        bias = flat[f"{module_name}/bias"][:, :, None]
        psg = np.concatenate([kernel, bias], axis=-1)  # (b, out, in+1)
        q_a = np.asarray(eigen[ACTIVATION_EIGENVECTORS_NAME][module_name], np.float64)
        q_g = np.asarray(eigen[GRADIENT_EIGENVECTORS_NAME][module_name], np.float64)
        projected = np.einsum("po,boi,iq->bpq", q_g.T, psg, q_a)
        expected = np.sum(projected**2, axis=0)
        np.testing.assert_allclose(
            lam[LAMBDA_MATRIX_NAME][module_name], expected, rtol=1e-6, atol=1e-9
        )
        assert int(lam[NUM_LAMBDA_PROCESSED][module_name][0]) == len(data["x"])


@pytest.mark.parametrize("batch_size", [1, 4, 10])
def test_lambda_batch_size_invariance(batch_size):
    base, _, _ = _fit_lambda(batch_size=5)
    other, _, _ = _fit_lambda(batch_size=batch_size)
    for module_name in base[LAMBDA_MATRIX_NAME]:
        np.testing.assert_allclose(
            base[LAMBDA_MATRIX_NAME][module_name],
            other[LAMBDA_MATRIX_NAME][module_name],
            rtol=1e-6,
            atol=1e-9,
        )


def test_diagonal_lambda_identity_basis():
    lam, _, (model, params, task, data) = _fit_lambda(batch_size=5, strategy="diagonal")
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    oracle = oracle_per_sample_gradients(model, params, task, batch)
    module_name = sorted(lam[LAMBDA_MATRIX_NAME])[0]

    def find(tree, target, prefix=""):
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                out = find(value, target, path)
                if out is not None:
                    return out
            elif path.startswith(target):
                return None
        return None

    # Build expected from oracle directly.
    flat = {}

    def walk(tree, prefix):
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, path)
            else:
                flat[path] = np.asarray(value)

    walk(oracle, "")
    kernel = flat[f"{module_name}/kernel"].transpose(0, 2, 1)
    bias = flat[f"{module_name}/bias"][:, :, None]
    psg = np.concatenate([kernel, bias], axis=-1)
    expected = np.sum(psg**2, axis=0)
    np.testing.assert_allclose(
        lam[LAMBDA_MATRIX_NAME][module_name], expected, rtol=1e-6, atol=1e-9
    )
