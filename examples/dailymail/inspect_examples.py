"""Prints the most influential training pair for a query summary.

Reference analogue: /root/reference/examples/dailymail/inspect_examples.py
(loads saved pairwise scores, decodes the query and its top-scored train
example). With synthetic data the token ids are printed raw; with --real the
T5 tokenizer decodes them.

    python examples/dailymail/inspect_examples.py --eval_idx 1
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.dailymail.pipeline import MODEL_NAME, get_dailymail_dataset
from kronfluence_tpu import Analyzer


def _decode(ids, mask, tokenizer):
    ids = np.asarray(ids)[np.asarray(mask) > 0]
    if tokenizer is None:
        return np.array2string(ids, threshold=16)
    return tokenizer.decode(ids, skip_special_tokens=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_idx", type=int, default=1)
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--scores_name", default="pairwise")
    parser.add_argument("--output_dir", default="./influence_results/dailymail")
    args = parser.parse_args()

    path = (
        Path(args.output_dir)
        / "dailymail"
        / f"scores_{args.scores_name}"
        / "pairwise_scores.safetensors"
    )
    scores = np.asarray(Analyzer.load_file(path)["all_modules"], np.float32)

    train_data = get_dailymail_dataset("train", args.num_train, seed=0, real=args.real)
    query_data = get_dailymail_dataset("valid", args.num_query, seed=1, real=args.real)

    tokenizer = None
    if args.real:
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(MODEL_NAME, use_fast=True)
        except Exception as exc:
            print(f"tokenizer unavailable ({exc}); printing raw token ids")

    qi = args.eval_idx
    print("Query Data Example:")
    print(f"  Input: {_decode(query_data['input_ids'][qi], query_data['attention_mask'][qi], tokenizer)}")
    print(f"  Label: {_decode(query_data['decoder_input_ids'][qi], query_data['decoder_attention_mask'][qi], tokenizer)}")

    top_idx = int(np.argsort(-scores[qi])[0])
    print(f"Top Influential Example (train idx {top_idx}, score {scores[qi, top_idx]:.3e}):")
    print(f"  Input: {_decode(train_data['input_ids'][top_idx], train_data['attention_mask'][top_idx], tokenizer)}")
    print(f"  Label: {_decode(train_data['decoder_input_ids'][top_idx], train_data['decoder_attention_mask'][top_idx], tokenizer)}")


if __name__ == "__main__":
    main()
