"""Multi-process (simulated multi-host) runtime test.

Launches 2 processes x 4 virtual CPU devices each via
`jax.distributed.initialize` (the analogue of the reference's 4-GPU torchrun
tests, tests/gpu_tests/ddp_test.py) and checks that the 8-device multi-host
covariance fit reproduces the single-process result bit-for-bit in fp64.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from kronfluence_tpu import Task, prepare_model
from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
from kronfluence_tpu.utils.common.factor_arguments import pytest_factor_arguments
from kronfluence_tpu.utils.dataset import BatchLoader
from kronfluence_tpu.utils.save import load_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_factors_match_single(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(rank), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outputs = [p.communicate(timeout=570)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {rank} failed:\n{out[-3000:]}"

    multihost = load_file(tmp_path / "multihost_factors.safetensors")

    # Single-process reference on the same data/model.
    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = jnp.tanh(nn.Dense(8, param_dtype=jnp.float64, name="fc1")(x))
            return nn.Dense(2, param_dtype=jnp.float64, name="fc2")(x)

    class RegressionTask(Task):
        def compute_train_loss(self, batch, model, sample=False, rng=None):
            preds = model(batch["x"])
            return 0.5 * jnp.sum((preds - batch["y"]) ** 2)

        def compute_measurement(self, batch, model):
            return self.compute_train_loss(batch, model)

    rng = np.random.default_rng(0)
    data = {"x": rng.standard_normal((40, 6)), "y": rng.standard_normal((40, 2))}
    module = MLP()
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(data["x"][:1]))["params"]
    task = RegressionTask()
    model = prepare_model(module, task)
    args = pytest_factor_arguments()
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 8), args
    )
    checked = 0
    for factor, modules in cov.items():
        for name, arr in modules.items():
            key = f"{factor}.{name}"
            np.testing.assert_allclose(
                multihost[key], np.asarray(arr), rtol=1e-12, atol=1e-12,
            )
            checked += 1
    assert checked >= 8

    # Pairwise scores through the full multi-host pipeline match too.
    from kronfluence_tpu.factor.eigen import (
        fit_lambda_matrices_with_loader,
        perform_eigendecomposition,
    )
    from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
    from kronfluence_tpu.utils.common.score_arguments import pytest_score_arguments
    from kronfluence_tpu.utils.constants import ALL_MODULE_NAME

    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, 8), args, eigen_factors=eigen
    )
    queries = {"x": rng.standard_normal((8, 6)), "y": rng.standard_normal((8, 2))}
    scores = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(queries, 8), BatchLoader(data, 8),
        {**cov, **eigen, **lam}, args, pytest_score_arguments(),
    )
    multihost_scores = load_file(tmp_path / "multihost_scores.safetensors")["scores"]
    np.testing.assert_allclose(
        multihost_scores, np.asarray(scores[ALL_MODULE_NAME]), rtol=1e-10, atol=1e-10
    )
