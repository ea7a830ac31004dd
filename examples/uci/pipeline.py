"""UCI regression pipeline: dataset + model + task construction.

Mirrors the reference's per-example `pipeline.py` contract
(/root/reference/examples/uci/pipeline.py): `get_regression_dataset` returns
the train/eval splits, `construct_regression_mlp` the model. Real UCI
Concrete data loads from a local CSV when available (no network egress in
this environment); the synthetic generator reproduces its shape (8 features,
1 target, nonlinear ground truth) and is the default.
"""

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.models.mlp import MLP
from kronfluence_tpu.task import Task

CONCRETE_CSV = os.environ.get("UCI_CONCRETE_CSV", "")


class RegressionTask(Task):
    """Sum-MSE train loss; measurement = summed squared error of the query
    batch (reference examples/uci/analyze.py task)."""

    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        if not sample:
            return jnp.sum((preds - batch["y"]) ** 2)
        sampled = jax.lax.stop_gradient(preds) + jax.random.normal(
            rng, preds.shape, preds.dtype
        )
        return jnp.sum((preds - sampled) ** 2)

    def compute_measurement(self, batch, model):
        return jnp.sum((model(batch["x"]) - batch["y"]) ** 2)


def synthetic_concrete(num: int, seed: int = 0) -> Dict[str, np.ndarray]:
    """8 features -> 1 target with a nonlinear ground truth, like UCI Concrete."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num, 8)).astype(np.float32)
    w = rng.normal(size=(8,))
    y = np.tanh(x @ w) + 0.5 * (x[:, 0] * x[:, 1]) + 0.1 * rng.normal(size=num)
    return {"x": x, "y": y[:, None].astype(np.float32)}


def _load_concrete_csv(path: str) -> Dict[str, np.ndarray]:
    raw = np.genfromtxt(path, delimiter=",", skip_header=1).astype(np.float32)
    x, y = raw[:, :-1], raw[:, -1:]
    mean, std = x.mean(axis=0), x.std(axis=0) + 1e-8
    return {"x": (x - mean) / std, "y": (y - y.mean()) / (y.std() + 1e-8)}


def get_regression_dataset(
    split: str,
    num: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Returns a column-store dataset for `split` in {'train','eval'}.

    Uses the real Concrete CSV when `UCI_CONCRETE_CSV` points at one
    (reference pipeline downloads it; this environment has no egress),
    synthetic data otherwise.
    """
    if CONCRETE_CSV and os.path.exists(CONCRETE_CSV):
        data = _load_concrete_csv(CONCRETE_CSV)
        n = len(data["x"])
        cut = int(0.9 * n)
        sl = slice(0, cut) if split == "train" else slice(cut, n)
        data = {k: v[sl] for k, v in data.items()}
        if num is not None:
            data = {k: v[:num] for k, v in data.items()}
        return data
    base_seed = 0 if split == "train" else 1
    return synthetic_concrete(num or (512 if split == "train" else 64), seed=seed + base_seed)


def construct_regression_mlp(seed: int = 0) -> Tuple[MLP, Dict]:
    """3-layer MLP matching the reference architecture scale."""
    module = MLP(hidden_dims=(64, 64), out_dim=1)
    params = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8)))["params"]
    return module, params
