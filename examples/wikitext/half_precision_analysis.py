"""bf16 vs fp32 score-fidelity analysis.

Reference analogue: examples/wikitext/half_precision_analysis.py, whose
published result (README.md:97) is a 0.96 Spearman/Pearson correlation between
fp32 and bf16 pairwise scores over 481 queries. This script computes both
score sets on the same model/data and reports the correlations, attaching an
accuracy certificate to the bf16 speed recipe.

    python examples/wikitext/half_precision_analysis.py --num_train 128 --num_query 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.utils.common.factor_arguments import (
    all_low_precision_factor_arguments,
)
from kronfluence_tpu.utils.common.score_arguments import (
    all_low_precision_score_arguments,
)

from examples.wikitext.pipeline import (
    LanguageModelingTask,
    construct_gpt2,
    get_wikitext_dataset,
)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--d_model", type=int, default=256)
    parser.add_argument("--num_heads", type=int, default=4)
    parser.add_argument("--seq_len", type=int, default=128)
    parser.add_argument("--vocab", type=int, default=8192)
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--train_batch_size", type=int, default=16)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--fp8_storage", action="store_true",
                        help="also certify the float8 query-block storage recipe")
    parser.add_argument("--output_dir", default="./influence_results/wikitext_hp")
    return parser.parse_args()


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Mean per-query Spearman rank correlation."""
    def rank(v):
        order = np.argsort(v)
        r = np.empty_like(order, dtype=np.float64)
        r[order] = np.arange(len(v))
        return r

    cors = []
    for q in range(a.shape[0]):
        ra, rb = rank(a[q]), rank(b[q])
        cors.append(np.corrcoef(ra, rb)[0, 1])
    return float(np.mean(cors))


def main():
    args = parse_args()
    module, params = construct_gpt2(
        args.num_layers, args.d_model, args.num_heads, args.seq_len, args.vocab
    )
    task = LanguageModelingTask(args.num_layers)
    model = prepare_model(module, task)
    train = get_wikitext_dataset("train", args.num_train, args.seq_len, args.vocab, real=args.real)
    query = get_wikitext_dataset("validation", args.num_query, args.seq_len, args.vocab, real=args.real)

    analyzer = Analyzer("wikitext_hp", model, task, params=params,
                        output_dir=args.output_dir, disable_tqdm=True)

    recipes = {
        "fp32": (FactorArguments(strategy="ekfac"), ScoreArguments()),
        "bf16": (
            all_low_precision_factor_arguments(strategy="ekfac"),
            all_low_precision_score_arguments(),
        ),
    }
    if args.fp8_storage:
        # bf16 recipe + float8 storage of the resident query block (TPU
        # extension, ops/quantize.py): same pipeline precision, half the
        # query-block HBM. Heuristic damping (the low-precision presets'
        # default) is the intended regime — see the storage-dtype docs.
        # Factor arguments are identical to the bf16 recipe's, so the bf16
        # factors are REUSED (None) — only the score pass differs.
        sa8 = all_low_precision_score_arguments()
        sa8.query_gradient_storage_dtype = "float8_e4m3fn"
        recipes["bf16+fp8qs"] = (None, sa8)
    scores = {}
    for name, (fa, sa) in recipes.items():
        factors_name = f"ekfac_{name}" if fa is not None else "ekfac_bf16"
        if fa is not None:
            analyzer.fit_all_factors(
                factors_name, train, per_device_batch_size=args.train_batch_size,
                factor_args=fa, overwrite_output_dir=True,
            )
        analyzer.compute_pairwise_scores(
            f"pairwise_{name}", factors_name, query, train,
            per_device_query_batch_size=args.num_query,
            per_device_train_batch_size=args.train_batch_size,
            score_args=sa, overwrite_output_dir=True,
        )
        scores[name] = analyzer.load_pairwise_scores(f"pairwise_{name}")[
            "all_modules"
        ].astype(np.float64)
        analyzer.release_memory()

    a = scores["fp32"]
    results = {}
    for name in scores:
        if name == "fp32":
            continue
        b = scores[name]
        pearson = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
        rho = spearman(a, b)
        results[name] = (pearson, rho)
        print(f"\nfp32 vs {name} pairwise scores over {a.shape[0]} queries x {a.shape[1]} train:")
        print(f"  Pearson  (flattened): {pearson:.4f}")
        print(f"  Spearman (per-query mean): {rho:.4f}")
    print(f"  reference published (bf16): 0.96 (examples/wikitext/README.md:97)")
    return results["bf16"]


if __name__ == "__main__":
    main()
