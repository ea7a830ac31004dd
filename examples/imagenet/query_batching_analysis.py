"""Low-rank query-batching fidelity: full-rank vs rank-32 score correlation.

Reference analogue: /root/reference/examples/imagenet/query_batching_analysis.py
(scatter plot + averaged Spearman/Pearson correlation between full-rank and
`query_gradient_low_rank=32` pairwise scores). Plots are replaced by printed
correlations — the decision metric the reference README publishes (it reports
the rank-32 approximation preserving ordering with >0.9 correlation).

    python examples/imagenet/query_batching_analysis.py --num_train 128
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.imagenet.pipeline import construct_resnet, get_imagenet_dataset
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments


def _rank_correlations(a: np.ndarray, b: np.ndarray):
    """Per-query Spearman and Pearson correlations, averaged."""
    spearman, pearson = [], []
    for q in range(a.shape[0]):
        xa, xb = a[q].astype(np.float64), b[q].astype(np.float64)
        ra = np.argsort(np.argsort(xa)).astype(np.float64)
        rb = np.argsort(np.argsort(xb)).astype(np.float64)
        spearman.append(np.corrcoef(ra, rb)[0, 1])
        pearson.append(np.corrcoef(xa, xb)[0, 1])
    return float(np.mean(spearman)), float(np.mean(pearson))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="resnet9", choices=["resnet50", "resnet9"])
    parser.add_argument("--image_size", type=int, default=32)
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--per_device_batch_size", type=int, default=16)
    parser.add_argument("--query_gradient_low_rank", type=int, default=32)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/imagenet")
    args = parser.parse_args()

    model, variables, task = construct_resnet(
        args.arch, args.num_classes, args.image_size
    )
    train_data = get_imagenet_dataset(
        "train", args.num_train, args.image_size, args.num_classes, 0, args.real
    )
    query_data = get_imagenet_dataset(
        "valid", args.num_query, args.image_size, args.num_classes, 1, args.real
    )

    analyzer = Analyzer("imagenet_qb", model, task, params=variables,
                        output_dir=args.output_dir)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.per_device_batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    common = dict(
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.per_device_batch_size,
    )
    analyzer.compute_pairwise_scores(
        "full_rank", "ekfac", query_data, train_data,
        score_args=ScoreArguments(), **common,
    )
    analyzer.compute_pairwise_scores(
        f"qlr{args.query_gradient_low_rank}", "ekfac", query_data, train_data,
        score_args=ScoreArguments(
            query_gradient_low_rank=args.query_gradient_low_rank
        ),
        **common,
    )
    full = np.asarray(
        analyzer.load_pairwise_scores("full_rank")["all_modules"], np.float32
    )
    low = np.asarray(
        analyzer.load_pairwise_scores(f"qlr{args.query_gradient_low_rank}")[
            "all_modules"
        ],
        np.float32,
    )
    spearman, pearson = _rank_correlations(full, low)
    print(f"averaged Spearman correlation (full vs rank-{args.query_gradient_low_rank}): {spearman:.4f}")
    print(f"averaged Pearson  correlation (full vs rank-{args.query_gradient_low_rank}): {pearson:.4f}")


if __name__ == "__main__":
    main()
