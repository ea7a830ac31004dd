"""UCI-style regression example (reference: examples/uci).

Trains a 3-layer MLP on a synthetic Concrete-like regression problem, fits
EKFAC factors, and computes pairwise influence scores — the minimum
end-to-end workflow. CPU-runnable.

    python examples/uci/analyze.py --num_train 512 --queries 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.models.mlp import MLP
from kronfluence_tpu.task import Task

from examples.common import print_top_influences, train_model


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
        return jnp.sum((model(batch["x"]) - batch["y"]) ** 2)


def synthetic_concrete(num: int, seed: int = 0):
    """8 features -> 1 target with a nonlinear ground truth, like UCI Concrete."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num, 8)).astype(np.float32)
    w = rng.normal(size=(8,))
    y = np.tanh(x @ w) + 0.5 * (x[:, 0] * x[:, 1]) + 0.1 * rng.normal(size=num)
    return {"x": x, "y": y[:, None].astype(np.float32)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=512)
    parser.add_argument("--queries", type=int, default=16)
    parser.add_argument("--train_batch_size", type=int, default=64)
    parser.add_argument("--output_dir", default="./influence_results/uci")
    parser.add_argument("--strategy", default="ekfac")
    args = parser.parse_args()

    train_data = synthetic_concrete(args.num_train, seed=0)
    query_data = synthetic_concrete(args.queries, seed=1)

    module = MLP(hidden_dims=(64, 64), out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))["params"]
    task = RegressionTask()
    model = prepare_model(module, task)

    params = train_model(
        lambda p, b, k: task.compute_train_loss(b, model.bind(p)) / len(b["y"]),
        params, train_data, num_epochs=10,
    )

    analyzer = Analyzer("uci", model, task, params=params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.train_batch_size,
        factor_args=FactorArguments(strategy=args.strategy, use_empirical_fisher=True),
    )
    analyzer.compute_pairwise_scores(
        "pairwise", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.queries,
        per_device_train_batch_size=args.train_batch_size,
        score_args=ScoreArguments(),
    )
    scores = analyzer.load_pairwise_scores("pairwise")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    print_top_influences(scores)
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
