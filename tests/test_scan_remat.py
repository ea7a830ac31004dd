"""Scan- and remat-compatible capture (SURVEY.md §7 "Hard parts").

The reference tolerates gradient checkpointing (its hooks fire twice and it
keeps the latest activation, module/tracker/factor.py:72-74) but has no scan
analogue (torch has no scan). Here:

  * a `jax.checkpoint`/`nn.remat` model must produce factors identical to the
    plain model;
  * a `scan_layers` model (one block scanned over stacked params) must produce
    per-layer factors identical to the unrolled model.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu import Task, prepare_model
from kronfluence_tpu import nn as knn
from kronfluence_tpu.capture.functional import scan_layers
from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
from kronfluence_tpu.factor.eigen import (
    fit_lambda_matrices_with_loader,
    perform_eigendecomposition,
)
from kronfluence_tpu.utils.common.factor_arguments import pytest_factor_arguments
from kronfluence_tpu.utils.constants import (
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    LAMBDA_MATRIX_NAME,
)
from kronfluence_tpu.utils.dataset import BatchLoader

D = 8
L = 3
N = 24


class RegressionTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        if sample:
            targets = jax.lax.stop_gradient(preds) + jax.random.normal(
                rng, preds.shape, preds.dtype
            )
        else:
            targets = batch["y"]
        return 0.5 * jnp.sum((preds - targets) ** 2)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)


def _data(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.standard_normal((N, D)),
        "y": rng.standard_normal((N, D)),
    }


def _stacked_params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.standard_normal((L, D, D)) / np.sqrt(D)),
        "b": jnp.asarray(rng.standard_normal((L, D)) * 0.1),
    }


def _unrolled_apply(params, x):
    h = x
    for i in range(L):
        h = jnp.tanh(knn.linear(h, params["w"][i], params["b"][i], name=f"blk_{i}/dense"))
    return h


def _scanned_apply(params, x):
    def body(h, layer):
        out = jnp.tanh(knn.linear(h, layer["w"], layer["b"], name="dense"))
        return out, None

    h, _ = scan_layers(body, x, params, name_format="blk_{i}")
    return h


def _fit(apply_fn, params, strategy="ekfac"):
    task = RegressionTask()
    model = prepare_model(apply_fn, task)
    args = pytest_factor_arguments(strategy=strategy)
    loader = BatchLoader(_data(), 8)
    cov = fit_covariance_matrices_with_loader(model, params, task, loader, args)
    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, loader, args, eigen_factors=eigen
    )
    return cov, eigen, lam


def test_scan_factors_match_unrolled():
    params = _stacked_params()
    cov_u, _, lam_u = _fit(_unrolled_apply, params)
    cov_s, _, lam_s = _fit(_scanned_apply, params)
    names = sorted(cov_u[ACTIVATION_COVARIANCE_MATRIX_NAME])
    assert names == [f"blk_{i}/dense" for i in range(L)]
    assert sorted(cov_s[ACTIVATION_COVARIANCE_MATRIX_NAME]) == names
    for name in names:
        for factor in (ACTIVATION_COVARIANCE_MATRIX_NAME, GRADIENT_COVARIANCE_MATRIX_NAME):
            np.testing.assert_allclose(
                np.asarray(cov_s[factor][name]),
                np.asarray(cov_u[factor][name]),
                rtol=1e-12, atol=1e-12,
            )
        np.testing.assert_allclose(
            np.asarray(lam_s[LAMBDA_MATRIX_NAME][name]),
            np.asarray(lam_u[LAMBDA_MATRIX_NAME][name]),
            rtol=1e-9, atol=1e-12,
        )


def test_scan_outside_capture_is_plain_scan():
    params = _stacked_params()
    x = jnp.asarray(_data()["x"])
    np.testing.assert_allclose(
        np.asarray(_scanned_apply(params, x)),
        np.asarray(_unrolled_apply(params, x)),
        rtol=1e-12,
    )


class PlainMLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(D, param_dtype=jnp.float64, name="fc1")(x))
        return nn.Dense(D, param_dtype=jnp.float64, name="fc2")(x)


def _checkpointed_apply(params, x):
    from kronfluence_tpu.capture.functional import checkpoint_block

    h = x
    for i in range(L):

        def block(h_, w_, b_, i=i):
            return jnp.tanh(knn.linear(h_, w_, b_, name=f"blk_{i}/dense"))

        h = checkpoint_block(block, h, params["w"][i], params["b"][i])
    return h


def test_checkpoint_block_matches_unrolled():
    """Per-block gradient checkpointing (nn.remat analogue) yields identical
    factors to the plain model."""
    params = _stacked_params()
    cov_u, _, lam_u = _fit(_unrolled_apply, params)
    cov_c, _, lam_c = _fit(_checkpointed_apply, params)
    for name in cov_u[ACTIVATION_COVARIANCE_MATRIX_NAME]:
        for factor in (ACTIVATION_COVARIANCE_MATRIX_NAME, GRADIENT_COVARIANCE_MATRIX_NAME):
            np.testing.assert_allclose(
                np.asarray(cov_c[factor][name]),
                np.asarray(cov_u[factor][name]),
                rtol=1e-12, atol=1e-12,
            )
        np.testing.assert_allclose(
            np.asarray(lam_c[LAMBDA_MATRIX_NAME][name]),
            np.asarray(lam_u[LAMBDA_MATRIX_NAME][name]),
            rtol=1e-9, atol=1e-12,
        )


def test_engine_remat_flag_matches_plain():
    """capture(remat=True) — offload_activations_to_cpu's TPU analogue."""
    import dataclasses

    params = _stacked_params()
    task = RegressionTask()
    model = prepare_model(_unrolled_apply, task)
    args = pytest_factor_arguments()
    loader = BatchLoader(_data(), 8)
    base = fit_covariance_matrices_with_loader(model, params, task, loader, args)
    args_r = dataclasses.replace(args, offload_activations_to_cpu=True)
    remat = fit_covariance_matrices_with_loader(model, params, task, loader, args_r)
    name = "blk_0/dense"
    np.testing.assert_allclose(
        np.asarray(remat[ACTIVATION_COVARIANCE_MATRIX_NAME][name]),
        np.asarray(base[ACTIVATION_COVARIANCE_MATRIX_NAME][name]),
        rtol=1e-12, atol=1e-12,
    )


def test_iterative_lambda_matches_batched():
    import dataclasses

    params = _stacked_params()
    task = RegressionTask()
    model = prepare_model(_unrolled_apply, task)
    args = pytest_factor_arguments()
    loader = BatchLoader(_data(), 8)
    cov = fit_covariance_matrices_with_loader(model, params, task, loader, args)
    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, loader, args, eigen_factors=eigen
    )
    args_it = dataclasses.replace(args, use_iterative_lambda_aggregation=True)
    lam_it = fit_lambda_matrices_with_loader(
        model, params, task, loader, args_it, eigen_factors=eigen
    )
    for name in lam[LAMBDA_MATRIX_NAME]:
        np.testing.assert_allclose(
            np.asarray(lam_it[LAMBDA_MATRIX_NAME][name]),
            np.asarray(lam[LAMBDA_MATRIX_NAME][name]),
            rtol=1e-9, atol=1e-12,
        )


def test_scan_remat_factors_match_unrolled():
    """scan_layers(remat=True): per-block checkpointing inside the scan must
    leave factors identical (only backward memory behavior changes)."""
    params = _stacked_params()

    def _scanned_remat(params, x):
        def body(h, layer):
            out = jnp.tanh(knn.linear(h, layer["w"], layer["b"], name="dense"))
            return out, None

        h, _ = scan_layers(body, x, params, name_format="blk_{i}", remat=True)
        return h

    cov_u, _, lam_u = _fit(_unrolled_apply, params)
    cov_s, _, lam_s = _fit(_scanned_remat, params)
    for name in [f"blk_{i}/dense" for i in range(L)]:
        for factor in (ACTIVATION_COVARIANCE_MATRIX_NAME, GRADIENT_COVARIANCE_MATRIX_NAME):
            np.testing.assert_allclose(
                np.asarray(cov_s[factor][name]), np.asarray(cov_u[factor][name]),
                rtol=1e-12, atol=1e-12,
            )
        np.testing.assert_allclose(
            np.asarray(lam_s[LAMBDA_MATRIX_NAME][name]),
            np.asarray(lam_u[LAMBDA_MATRIX_NAME][name]),
            rtol=1e-9, atol=1e-12,
        )
