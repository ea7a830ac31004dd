"""Counterfactual retraining: do influence scores predict loss changes?

The signature UCI analysis (reference: examples/uci/tutorial.ipynb and
examples/wikitext/run_counterfactual.py:1-60): pick a query point, remove the
k most positively-influential / most negatively-influential / random training
examples, retrain from scratch, and compare the query's loss change. If EKFAC
influence is faithful, removing positive-influence examples should RAISE the
query loss far more than removing random ones, and removing negative-influence
examples should LOWER it.

    python examples/uci/run_counterfactual.py --num_train 256 --remove 20
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np

from examples.common import train_model
from examples.uci.pipeline import (
    RegressionTask,
    construct_regression_mlp,
    get_regression_dataset,
)
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--queries", type=int, default=8)
    parser.add_argument("--remove", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seeds", type=int, default=3, help="retrain seeds to average")
    parser.add_argument("--output_dir", default="./influence_results/uci_counterfactual")
    return parser.parse_args()


def retrain_and_eval(task, train_data, query_data, keep_idx, epochs, batch_size, seed):
    """Retrains from scratch on `keep_idx` rows; returns mean query loss."""
    module, params = construct_regression_mlp(seed=seed)
    model = prepare_model(module, task)
    subset = {k: v[keep_idx] for k, v in train_data.items()}
    params = train_model(
        lambda p, b, k: task.compute_train_loss(b, model.bind(p)) / len(b["y"]),
        params, subset, batch_size=min(batch_size, len(keep_idx)),
        num_epochs=epochs, seed=seed,
    )
    loss = task.compute_measurement(
        jax.tree_util.tree_map(jax.numpy.asarray, query_data), model.bind(params)
    )
    return float(loss) / len(query_data["y"])


def main():
    args = parse_args()
    train_data = get_regression_dataset("train", args.num_train, seed=0)
    query_data = get_regression_dataset("eval", args.queries, seed=0)
    task = RegressionTask()

    # Train the analysis model and compute influence scores.
    module, params = construct_regression_mlp(seed=0)
    model = prepare_model(module, task)
    params = train_model(
        lambda p, b, k: task.compute_train_loss(b, model.bind(p)) / len(b["y"]),
        params, train_data, batch_size=args.batch_size, num_epochs=args.epochs,
    )
    analyzer = Analyzer(
        "uci_cf", model, task, params=params, output_dir=args.output_dir,
        disable_tqdm=True,
    )
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac", use_empirical_fisher=True),
        overwrite_output_dir=True,
    )
    analyzer.compute_pairwise_scores(
        "cf", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.queries,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(), overwrite_output_dir=True,
    )
    scores = analyzer.load_pairwise_scores("cf")["all_modules"]
    # Positive pairwise score = removing the example INCREASES query loss.
    total = scores.sum(axis=0)  # aggregate influence on the query set
    order = np.argsort(total)
    most_negative = order[: args.remove]
    most_positive = order[::-1][: args.remove]
    rng = np.random.default_rng(0)

    all_idx = np.arange(args.num_train)
    conditions = {
        "full dataset": all_idx,
        "remove most-positive": np.setdiff1d(all_idx, most_positive),
        "remove most-negative": np.setdiff1d(all_idx, most_negative),
        "remove random": None,  # re-drawn per seed
    }
    print(f"\nCounterfactual retraining ({args.seeds} seeds, removing {args.remove}):")
    results = {}
    for name, keep in conditions.items():
        losses = []
        for seed in range(args.seeds):
            if name == "remove random":
                drop = rng.choice(all_idx, size=args.remove, replace=False)
                keep_s = np.setdiff1d(all_idx, drop)
            else:
                keep_s = keep
            losses.append(
                retrain_and_eval(
                    task, train_data, query_data, keep_s,
                    args.epochs, args.batch_size, seed,
                )
            )
        results[name] = (np.mean(losses), np.std(losses))
        print(f"  {name:<24} query loss {results[name][0]:.4f} +- {results[name][1]:.4f}")

    base = results["full dataset"][0]
    pos = results["remove most-positive"][0]
    rand = results["remove random"][0]
    print(
        f"\nremoving most-positive raised loss by {pos - base:+.4f} "
        f"vs random {rand - base:+.4f} -> influence is "
        f"{'predictive' if pos - base > rand - base else 'NOT predictive'}"
    )


if __name__ == "__main__":
    main()
