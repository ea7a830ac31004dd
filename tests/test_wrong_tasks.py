"""Negative-path tests: misconfigured tasks fail with clear errors.

The analogue of the reference's "wrong task" fixtures (tests/utils.py:72-155,
WrongClassificationTask / WrongTextClassificationTask) — but where the
reference only demonstrates that misconfiguration changes results, these
assert the TPU build *detects* it up front (utils/task_check.py) or at
capture time (capture/engine.py, capture/context.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kronfluence_tpu.nn as knn
from kronfluence_tpu.analyzer import Analyzer
from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.exceptions import (
    IllegalTaskConfigurationError,
    TrackedModuleNotFoundError,
)
from kronfluence_tpu.utils.task_check import verify_task_configuration

from tests.testable_tasks.regression import RegressionTask, make_mlp, make_regression_data


class MeanReducedTask(RegressionTask):
    """The classic mistake: reduction='mean' instead of 'sum'."""

    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        return jnp.mean((preds - batch["y"]) ** 2)


class NonScalarLossTask(RegressionTask):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        return ((preds - batch["y"]) ** 2).sum(axis=-1)  # per-sample vector


class NonScalarMeasurementTask(RegressionTask):
    def compute_measurement(self, batch, model):
        return model(batch["x"])  # forgot to reduce


class WrongMaskTask(RegressionTask):
    """Mask shaped like nothing in the model — silently ignored otherwise."""

    def get_attention_mask(self, batch):
        return np.ones((batch["x"].shape[0], 3), dtype=np.float32)


class UnknownModuleMaskTask(RegressionTask):
    def get_attention_mask(self, batch):
        return {"not_a_module": np.ones((batch["x"].shape[0],), dtype=np.float32)}


class UnknownTrackedModulesTask(RegressionTask):
    def get_influence_tracked_modules(self):
        return ["transformer.h.99.mlp"]


def _setup(task):
    model, params, _ = make_mlp()
    model = prepare_model(model, task)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_regression_data(6, seed=3)
    )
    return model, params, batch


def test_mean_reduced_loss_detected():
    task = MeanReducedTask()
    model, params, batch = _setup(task)
    with pytest.raises(IllegalTaskConfigurationError, match="mean-reduced"):
        verify_task_configuration(model, params, task, batch)


def test_summed_loss_passes():
    task = RegressionTask()
    model, params, batch = _setup(task)
    verify_task_configuration(model, params, task, batch)  # no raise


def test_non_scalar_loss_detected():
    task = NonScalarLossTask()
    model, params, batch = _setup(task)
    with pytest.raises(IllegalTaskConfigurationError, match="must return a scalar"):
        verify_task_configuration(model, params, task, batch)


def test_non_scalar_loss_raises_in_stage(tmp_path):
    """Even without verify_task, the capture engine rejects non-scalar losses."""
    task = NonScalarLossTask()
    model, params, batch = _setup(task)
    analyzer = Analyzer(
        "wrong", model, task, params=params, output_dir=str(tmp_path),
        disable_tqdm=True,
    )
    with pytest.raises((ValueError, IllegalTaskConfigurationError), match="scalar"):
        analyzer.fit_covariance_matrices(
            "f", make_regression_data(8), per_device_batch_size=4,
            factor_args=FactorArguments(strategy="ekfac"),
        )


def test_non_scalar_measurement_detected():
    task = NonScalarMeasurementTask()
    model, params, batch = _setup(task)
    with pytest.raises(
        IllegalTaskConfigurationError, match="compute_measurement must return a scalar"
    ):
        verify_task_configuration(model, params, task, batch)


def test_mis_shaped_attention_mask_detected():
    task = WrongMaskTask()
    model, params, batch = _setup(task)
    with pytest.raises(IllegalTaskConfigurationError, match="silently ignored"):
        verify_task_configuration(model, params, task, batch)


def test_unknown_module_in_mask_dict_detected():
    task = UnknownModuleMaskTask()
    model, params, batch = _setup(task)
    with pytest.raises(IllegalTaskConfigurationError, match="unknown modules"):
        verify_task_configuration(model, params, task, batch)


def test_unknown_tracked_module_names_detected():
    task = UnknownTrackedModulesTask()
    model, params, batch = _setup(task)
    with pytest.raises(TrackedModuleNotFoundError, match="never"):
        verify_task_configuration(model, params, task, batch)


def test_analyzer_verify_task_entrypoint(tmp_path):
    model, params, _ = make_mlp()
    good = RegressionTask()
    analyzer = Analyzer(
        "ok", prepare_model(model, good), good, params=params,
        output_dir=str(tmp_path), disable_tqdm=True,
    )
    analyzer.verify_task(make_regression_data(12))
    bad_task = MeanReducedTask()
    bad = Analyzer(
        "bad", prepare_model(model, bad_task), bad_task, params=params,
        output_dir=str(tmp_path), disable_tqdm=True,
    )
    with pytest.raises(IllegalTaskConfigurationError):
        bad.verify_task(make_regression_data(12))


def test_inconsistent_specs_across_uses():
    """One tagged name used with two different layer shapes must error."""

    def apply_fn(params, x):
        h = knn.linear(x, params["w1"], name="layer")
        return knn.linear(h, params["w2"], name="layer")  # same name, new shape

    model = prepare_model(apply_fn)
    params = {
        "w1": jnp.ones((4, 6), jnp.float32),
        "w2": jnp.ones((6, 2), jnp.float32),
    }
    with pytest.raises(ValueError, match="inconsistent specs"):
        model.discover(params, jnp.ones((3, 4), jnp.float32))


def test_nondeterministic_forward_detected():
    """A forward whose trace changes between discovery and capture errors
    instead of silently mis-attributing gradients."""
    from kronfluence_tpu.capture.engine import capture

    calls = {"n": 0}

    def apply_fn(params, x):
        calls["n"] += 1
        h = knn.linear(x, params["w"], name="a")
        if calls["n"] % 2 == 0:  # python-level nondeterminism across traces
            h = knn.linear(h, params["w2"], name="b")
        return h

    params = {
        "w": jnp.ones((4, 4), jnp.float32),
        "w2": jnp.ones((4, 4), jnp.float32),
    }
    x = jnp.ones((2, 4), jnp.float32)
    with pytest.raises((RuntimeError, KeyError), match="deterministic|probe"):
        capture(lambda: jnp.sum(apply_fn(params, x)))
