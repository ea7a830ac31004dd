"""bf16 vs fp32 pairwise-score fidelity on GLUE (reference:
examples/glue/half_precision_analysis.py, which scatter-plots bf16 vs fp32
pairwise scores).

    python examples/glue/half_precision_analysis.py --num_train 256
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.glue.pipeline import construct_classifier, get_sst2_dataset
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments
from kronfluence_tpu.utils.common.factor_arguments import (
    all_low_precision_factor_arguments,
)
from kronfluence_tpu.utils.common.score_arguments import (
    all_low_precision_score_arguments,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--output_dir", default="./influence_results/glue_half")
    args = parser.parse_args()

    train_data = get_sst2_dataset("train", args.num_train)
    query_data = get_sst2_dataset("eval", args.num_query, seed=1)
    model, params, task = construct_classifier()
    analyzer = Analyzer("glue_half", model, task, params=params,
                        output_dir=args.output_dir)

    def run(tag, factor_args, score_args):
        analyzer.fit_all_factors(
            tag, train_data, per_device_batch_size=args.batch_size,
            factor_args=factor_args,
        )
        analyzer.compute_pairwise_scores(
            tag, tag, query_data, train_data,
            per_device_query_batch_size=args.num_query,
            per_device_train_batch_size=args.batch_size,
            score_args=score_args,
        )
        return np.asarray(
            analyzer.load_pairwise_scores(tag)["all_modules"], dtype=np.float64
        )

    fp32 = run("fp32", FactorArguments(strategy="ekfac"), ScoreArguments())
    bf16 = run(
        "bf16",
        all_low_precision_factor_arguments(strategy="ekfac", dtype="bfloat16"),
        all_low_precision_score_arguments(dtype="bfloat16"),
    )

    flat32, flat16 = fp32.ravel(), bf16.ravel()
    pearson = float(np.corrcoef(flat32, flat16)[0, 1])
    from scipy.stats import spearmanr

    spearman = float(spearmanr(flat32, flat16).statistic)
    print(f"pairwise bf16 vs fp32: pearson={pearson:.4f} spearman={spearman:.4f}")


if __name__ == "__main__":
    main()
