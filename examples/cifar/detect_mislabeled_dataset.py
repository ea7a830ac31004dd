"""CIFAR-style mislabeled-example detection via self-influence scores
(reference: examples/cifar/detect_mislabeled_dataset.py).

Trains ResNet-9 on images with 10% deliberately corrupted labels, computes
EKFAC self-influence, and reports what fraction of the corrupted labels
appear in the top-scoring examples — high self-influence flags mislabeled
data.

    python examples/cifar/detect_mislabeled_dataset.py --num_train 1024
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.cifar.pipeline import get_cifar10_dataset, train_resnet9
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/cifar")
    args = parser.parse_args()

    train_data, corrupt_idx = get_cifar10_dataset(
        "train", args.num_train, corrupt_frac=0.1, real=args.real
    )
    analysis_params, model, task = train_resnet9(
        train_data, epochs=args.epochs, batch_size=args.batch_size
    )

    analyzer = Analyzer("cifar", model, task, params=analysis_params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_self_scores(
        "self", "ekfac", train_data, per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(),
    )
    scores = analyzer.load_self_scores("self")["all_modules"]

    order = np.argsort(scores)[::-1]
    corrupt = set(map(int, corrupt_idx))
    for frac in (0.1, 0.2):
        top = set(map(int, order[: int(len(order) * frac)]))
        recall = len(top & corrupt) / len(corrupt)
        print(f"top-{int(frac*100)}% self-influence captures "
              f"{100*recall:.1f}% of mislabeled examples")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
