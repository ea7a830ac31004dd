"""Linear datamodeling score (LDS) evaluation for the SWAG-style example.

Counterfactual check of influence-score quality (reference:
examples/swag/evaluate_lds.py): retrain on random train subsets and
rank-correlate the measured query margins against the subset-summed pairwise
scores — with the choice-folded encoder and
`post_process_per_sample_gradient` in the loop.

    python examples/swag/evaluate_lds.py --num_train 128 --num_subsets 32
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.common import train_model
from examples.swag.pipeline import construct_choice_model, synthetic_swag
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments
from kronfluence_tpu.evaluate import evaluate_lds, sample_subset_masks


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--num_subsets", type=int, default=32)
    parser.add_argument("--subset_fraction", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--query_gradient_low_rank", type=int, default=None)
    parser.add_argument("--output_dir", default="./influence_results/swag_lds")
    parser.add_argument("--strategies", nargs="+", default=["ekfac", "identity"])
    args = parser.parse_args()

    train_data = synthetic_swag(args.num_train, seed=0)
    query_data = synthetic_swag(args.num_query, seed=1)
    model, params_init, task = construct_choice_model()

    def loss_fn(params, batch, key):
        del key
        return task.compute_train_loss(batch, model.bind(params))

    def train_on(data, seed):
        return train_model(
            loss_fn, params_init, data, batch_size=args.batch_size,
            num_epochs=args.epochs, seed=seed,
        )

    params_full = train_on(train_data, seed=0)

    def train_fn(idx, seed):
        subset = {k: v[idx] for k, v in train_data.items()}
        return train_on(subset, seed=0)  # fixed seed: subset is the treatment

    def measure_fn(params):
        losses = []
        for i in range(args.num_query):
            batch = {k: v[i : i + 1] for k, v in query_data.items()}
            losses.append(float(task.compute_train_loss(batch, model.bind(params))))
        return -np.asarray(losses)

    masks = sample_subset_masks(
        args.num_train, args.num_subsets, args.subset_fraction, seed=3
    )
    for strategy in args.strategies:
        analyzer = Analyzer(
            f"swag_lds_{strategy}", model, task, params=params_full,
            output_dir=args.output_dir,
        )
        analyzer.fit_all_factors(
            "factors", train_data, per_device_batch_size=args.batch_size,
            factor_args=FactorArguments(strategy=strategy, use_empirical_fisher=True),
        )
        analyzer.compute_pairwise_scores(
            "scores", "factors", query_data, train_data,
            per_device_query_batch_size=args.num_query,
            per_device_train_batch_size=args.batch_size,
            score_args=ScoreArguments(
                query_gradient_low_rank=args.query_gradient_low_rank
            ),
        )
        scores = analyzer.load_pairwise_scores("scores")["all_modules"]
        lds, per_query = evaluate_lds(
            scores, train_fn, measure_fn, args.num_train, masks=masks
        )
        print(f"LDS[{strategy}] = {lds:.4f} (per-query mean of {len(per_query)})")


if __name__ == "__main__":
    main()
