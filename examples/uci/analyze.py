"""UCI-style regression example (reference: examples/uci).

Trains a 3-layer MLP on the Concrete regression problem (synthetic mirror by
default, real CSV via UCI_CONCRETE_CSV), fits EKFAC factors, and computes
pairwise influence scores — the minimum end-to-end workflow. CPU-runnable.

    python examples/uci/analyze.py --num_train 512 --queries 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model

from examples.common import print_top_influences, train_model
from examples.uci.pipeline import (
    RegressionTask,
    construct_regression_mlp,
    get_regression_dataset,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=512)
    parser.add_argument("--queries", type=int, default=16)
    parser.add_argument("--train_batch_size", type=int, default=64)
    parser.add_argument("--output_dir", default="./influence_results/uci")
    parser.add_argument("--strategy", default="ekfac")
    args = parser.parse_args()

    train_data = get_regression_dataset("train", args.num_train)
    query_data = get_regression_dataset("eval", args.queries)

    module, params = construct_regression_mlp()
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
