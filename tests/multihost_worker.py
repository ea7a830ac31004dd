"""Worker script for the multi-process CPU test (tests/test_multihost.py).

Run as: python multihost_worker.py <coordinator> <num_procs> <rank> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator, num_procs, rank, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from kronfluence_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=rank
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from kronfluence_tpu import Task, prepare_model
    from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
    from kronfluence_tpu.parallel.mesh import make_mesh
    from kronfluence_tpu.utils.common.factor_arguments import pytest_factor_arguments
    from kronfluence_tpu.utils.dataset import BatchLoader
    from kronfluence_tpu.utils.platform import fetch_tree
    from kronfluence_tpu.utils.save import save_file

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = jnp.tanh(nn.Dense(8, param_dtype=jnp.float64, name="fc1")(x))
            return nn.Dense(2, param_dtype=jnp.float64, name="fc2")(x)

    class RegressionTask(Task):
        def compute_train_loss(self, batch, model, sample=False, rng=None):
            preds = model(batch["x"])
            targets = batch["y"]
            return 0.5 * jnp.sum((preds - targets) ** 2)

        def compute_measurement(self, batch, model):
            return self.compute_train_loss(batch, model)

    rng = np.random.default_rng(0)
    data = {
        "x": rng.standard_normal((40, 6)),
        "y": rng.standard_normal((40, 2)),
    }
    module = MLP()
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(data["x"][:1]))["params"]
    task = RegressionTask()
    model = prepare_model(module, task)
    args = pytest_factor_arguments()

    mesh = make_mesh(data=4 * num_procs)
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 8), args, mesh=mesh
    )
    distributed.sync_global_devices("covariance_done")
    if distributed.is_main_process():
        flat = {}
        host = fetch_tree(cov)
        for factor, modules in host.items():
            for name, arr in modules.items():
                flat[f"{factor}.{name}"] = np.asarray(arr)
        save_file(flat, os.path.join(outdir, "multihost_factors.safetensors"))
    distributed.sync_global_devices("saved")

    # Full pipeline through pairwise scores on the multi-host mesh: eigh +
    # lambda + query/train passes, score assembly on every process (score
    # outputs are replicated), save gated to process 0.
    from kronfluence_tpu.factor.eigen import (
        fit_lambda_matrices_with_loader,
        perform_eigendecomposition,
    )
    from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
    from kronfluence_tpu.utils.common.score_arguments import pytest_score_arguments
    from kronfluence_tpu.utils.constants import ALL_MODULE_NAME

    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, 8), args, eigen_factors=eigen, mesh=mesh
    )
    queries = {
        "x": rng.standard_normal((8, 6)),
        "y": rng.standard_normal((8, 2)),
    }
    scores = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(queries, 8), BatchLoader(data, 8),
        {**cov, **eigen, **lam}, args, pytest_score_arguments(), mesh=mesh,
    )
    distributed.sync_global_devices("scores_done")
    if distributed.is_main_process():
        save_file(
            {"scores": np.asarray(scores[ALL_MODULE_NAME])},
            os.path.join(outdir, "multihost_scores.safetensors"),
        )
    distributed.sync_global_devices("scores_saved")
    print(f"worker {rank}: OK", flush=True)


if __name__ == "__main__":
    main()
