"""Inspect top/bottom influential SWAG training examples per query.

Reference analogue: /root/reference/examples/swag/influence_analysis.py
(prints the most/least influential training examples for selected queries).
With synthetic data the readable text is absent, so this prints indices,
scores, and label agreement — the structure the reference displays.

    python examples/swag/influence_analysis.py --num_train 128
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.swag.pipeline import construct_choice_model, get_swag_dataset
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--query_gradient_low_rank", type=int, default=16)
    parser.add_argument("--top_k", type=int, default=5)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/swag")
    args = parser.parse_args()

    model, params, task = construct_choice_model()
    train_data = get_swag_dataset("train", args.num_train, seed=0, real=args.real)
    query_data = get_swag_dataset("eval", args.num_query, seed=1, real=args.real)

    analyzer = Analyzer("swag", model, task, params=params,
                        output_dir=args.output_dir)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_pairwise_scores(
        "analysis", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(query_gradient_low_rank=args.query_gradient_low_rank),
    )
    scores = np.asarray(
        analyzer.load_pairwise_scores("analysis")["all_modules"], dtype=np.float64
    )

    for q in range(min(args.num_query, 3)):
        order = np.argsort(scores[q])[::-1]
        top, bottom = order[: args.top_k], order[-args.top_k :]
        q_label = int(query_data["label"][q])
        print(f"query {q} (label {q_label}):")
        for tag, idxs in (("top", top), ("bottom", bottom)):
            rows = ", ".join(
                f"#{int(i)} (score {scores[q, i]:+.3e}, label {int(train_data['label'][i])})"
                for i in idxs
            )
            print(f"  {tag:6s}: {rows}")
        agree = np.mean(train_data["label"][top] == q_label)
        print(f"  top-{args.top_k} label agreement with query: {agree:.2f}")


if __name__ == "__main__":
    main()
