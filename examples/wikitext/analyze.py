"""WikiText-style language-model influence analysis (reference: examples/wikitext).

GPT-2-class LM, EKFAC factors, pairwise scores with optional per-token
attribution. Uses synthetic token streams by default (no network egress); pass
--real to use a locally cached HF wikitext dataset + gpt2 tokenizer.

    python examples/wikitext/analyze.py --num_layers 4 --d_model 256 --seq_len 128
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

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
    synthetic_tokens,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--d_model", type=int, default=256)
    parser.add_argument("--num_heads", type=int, default=4)
    parser.add_argument("--seq_len", type=int, default=128)
    parser.add_argument("--vocab", type=int, default=8192)
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--train_batch_size", type=int, default=16)
    parser.add_argument("--per_token", action="store_true")
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--low_precision", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/wikitext")
    args = parser.parse_args()

    module, params = construct_gpt2(
        args.num_layers, args.d_model, args.num_heads, args.seq_len, args.vocab
    )
    task = LanguageModelingTask(args.num_layers)
    model = prepare_model(module, task)

    train_data = get_wikitext_dataset(
        "train", args.num_train, args.seq_len, args.vocab, real=args.real
    )
    query_data = get_wikitext_dataset(
        "validation", args.num_query, args.seq_len, args.vocab, real=args.real
    )

    if args.low_precision:
        factor_args = all_low_precision_factor_arguments(strategy="ekfac")
        score_args = all_low_precision_score_arguments()
    else:
        factor_args = FactorArguments(strategy="ekfac")
        score_args = ScoreArguments()
    score_args.compute_per_token_scores = args.per_token

    analyzer = Analyzer("wikitext", model, task, params=params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.train_batch_size,
        factor_args=factor_args,
    )
    analyzer.compute_pairwise_scores(
        "pairwise", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.train_batch_size,
        score_args=score_args,
    )
    scores = analyzer.load_pairwise_scores("pairwise")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
