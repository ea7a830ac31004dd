"""Regression testable task: tiny MLP + synthetic data + sum-MSE loss.

The analogue of reference tests/testable_tasks/regression.py — a real (tiny)
workload used as a fixture, not a mock backend.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.models.mlp import MLP, RepeatedMLP
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task


class RegressionTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        if not sample:
            return jnp.sum((preds - batch["y"]) ** 2)
        sampled = jax.lax.stop_gradient(preds) + jax.random.normal(
            rng, preds.shape, preds.dtype
        )
        return jnp.sum((preds - sampled) ** 2)

    def compute_measurement(self, batch, model):
        preds = model(batch["x"])
        return jnp.sum(preds)


def make_regression_data(num: int, in_dim: int = 8, out_dim: int = 1, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num, in_dim)).astype(np.float64)
    y = rng.normal(size=(num, out_dim)).astype(np.float64)
    return {"x": x, "y": y}


def make_mlp(in_dim: int = 8, out_dim: int = 1, seed: int = 0, shared: bool = False):
    module = (
        RepeatedMLP(hidden_dim=16, out_dim=out_dim)
        if shared
        else MLP(hidden_dims=(16, 12), out_dim=out_dim)
    )
    params = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, in_dim), jnp.float64)
    )["params"]
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.float64), params)
    task = RegressionTask()
    model = prepare_model(module, task)
    return model, params, task
