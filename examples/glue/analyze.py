"""GLUE-style text-classification influence analysis (reference: examples/glue).

Encoder transformer + classification head on token sequences with realistic
padding (attention masks exercised end-to-end), EKFAC factors, pairwise
scores.

    python examples/glue/analyze.py --num_train 256
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.glue.pipeline import construct_classifier, get_sst2_dataset
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/glue")
    args = parser.parse_args()

    model, params, task = construct_classifier()
    train_data = get_sst2_dataset("train", args.num_train, seed=0, real=args.real)
    query_data = get_sst2_dataset("eval", args.num_query, seed=1, real=args.real)

    analyzer = Analyzer("glue", model, task, params=params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_pairwise_scores(
        "pairwise", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(),
    )
    scores = analyzer.load_pairwise_scores("pairwise")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
