"""CNN/DailyMail-style seq2seq influence analysis (reference: examples/dailymail).

Encoder-decoder (T5-class) summarization task with *dict* attention masks:
encoder modules are masked/counted by the article mask, decoder modules by the
summary mask (reference: examples/dailymail/analyze.py).

    python examples/dailymail/analyze.py --num_train 128
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.common import load_params_checkpoint
from examples.dailymail.pipeline import construct_seq2seq, get_dailymail_dataset
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--checkpoint_dir", default="./checkpoints/dailymail")
    parser.add_argument("--output_dir", default="./influence_results/dailymail")
    args = parser.parse_args()

    model, params, task = construct_seq2seq()
    ckpt = Path(args.checkpoint_dir) / "model.safetensors"
    if ckpt.exists():
        params = load_params_checkpoint(ckpt, params)
        print(f"loaded checkpoint {ckpt}")

    train_data = get_dailymail_dataset("train", args.num_train, seed=0, real=args.real)
    query_data = get_dailymail_dataset("valid", args.num_query, seed=1, real=args.real)

    analyzer = Analyzer("dailymail", model, task, params=params,
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
    top = np.argsort(-np.asarray(scores, np.float32), axis=1)[:, :3]
    print(f"top-3 influential train examples per query:\n{top}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
