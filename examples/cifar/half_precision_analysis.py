"""bf16 vs fp32 self-influence fidelity on CIFAR (reference:
examples/cifar/half_precision_analysis.py, which plots bf16 vs fp32 scores
and reports their agreement).

Computes self-influence twice — full fp32 and the bf16 recipe
(`all_low_precision_factor_arguments`) — and reports Pearson/Spearman
correlation plus the top-k overlap that the mislabel-detection workflow
actually consumes.

    python examples/cifar/half_precision_analysis.py --num_train 512
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.cifar.pipeline import get_cifar10_dataset, train_resnet9
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments
from kronfluence_tpu.utils.common.factor_arguments import (
    all_low_precision_factor_arguments,
)
from kronfluence_tpu.utils.common.score_arguments import (
    all_low_precision_score_arguments,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--output_dir", default="./influence_results/cifar_half")
    args = parser.parse_args()

    train_data, _ = get_cifar10_dataset("train", args.num_train, corrupt_frac=0.1)
    analysis_params, model, task = train_resnet9(
        train_data, epochs=args.epochs, batch_size=args.batch_size, verbose=False
    )
    analyzer = Analyzer("cifar_half", model, task, params=analysis_params,
                        output_dir=args.output_dir)

    def run(tag, factor_args, score_args):
        analyzer.fit_all_factors(
            tag, train_data, per_device_batch_size=args.batch_size,
            factor_args=factor_args,
        )
        analyzer.compute_self_scores(
            tag, tag, train_data, per_device_train_batch_size=args.batch_size,
            score_args=score_args,
        )
        return np.asarray(
            analyzer.load_self_scores(tag)["all_modules"], dtype=np.float64
        )

    fp32 = run("fp32", FactorArguments(strategy="ekfac"), ScoreArguments())
    bf16 = run(
        "bf16",
        all_low_precision_factor_arguments(strategy="ekfac", dtype="bfloat16"),
        all_low_precision_score_arguments(dtype="bfloat16"),
    )

    pearson = float(np.corrcoef(fp32, bf16)[0, 1])
    from scipy.stats import spearmanr

    spearman = float(spearmanr(fp32, bf16).statistic)
    k = max(1, len(fp32) // 10)
    top_fp32 = set(np.argsort(fp32)[::-1][:k].tolist())
    top_bf16 = set(np.argsort(bf16)[::-1][:k].tolist())
    overlap = len(top_fp32 & top_bf16) / k
    print(f"self-influence bf16 vs fp32: pearson={pearson:.4f} "
          f"spearman={spearman:.4f} top-10% overlap={overlap:.3f}")


if __name__ == "__main__":
    main()
