"""Trains the WikiText-2 GPT-2-class LM and saves a checkpoint.

Reference analogue: /root/reference/examples/wikitext/train.py (3-epoch AdamW
fine-tune, train/eval perplexity report, checkpoint reloaded by analyze.py).

    python examples/wikitext/train.py --num_train 64 --epochs 1 --num_layers 2
"""

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from examples.common import train_model
from examples.wikitext.pipeline import LanguageModelingTask, construct_gpt2, get_wikitext_dataset
from kronfluence_tpu.analyzer import _flatten_params
from kronfluence_tpu.utils.save import save_file


def evaluate_loss(module, params, task, data, batch_size: int) -> float:
    """Mean per-token next-token CE over `data` (reference: evaluate_model)."""

    @jax.jit
    def batch_stats(params, batch):
        loss = task.compute_train_loss(batch, module.bind({"params": params}))
        tokens = jnp.sum(batch["attention_mask"][:, 1:])
        return loss, tokens

    num = len(data["input_ids"])
    total_loss, total_tokens = 0.0, 0.0
    for start in range(0, num, batch_size):
        batch = {k: jnp.asarray(v[start : start + batch_size]) for k, v in data.items()}
        loss, tokens = batch_stats(params, batch)
        total_loss += float(loss)
        total_tokens += float(tokens)
    return total_loss / max(1.0, total_tokens)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=64)
    parser.add_argument("--num_eval", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--eval_batch_size", type=int, default=16)
    parser.add_argument("--learning_rate", type=float, default=3e-5)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--num_layers", type=int, default=12)
    parser.add_argument("--d_model", type=int, default=768)
    parser.add_argument("--num_heads", type=int, default=12)
    parser.add_argument("--vocab", type=int, default=50257)
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--seed", type=int, default=1004)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default=None, help="unused; smoke-test compat")
    parser.add_argument("--checkpoint_dir", default="./checkpoints/wikitext")
    args = parser.parse_args()

    train_data = get_wikitext_dataset(
        "train", args.num_train, seq_len=args.seq_len, vocab=args.vocab, real=args.real
    )
    module, params = construct_gpt2(
        num_layers=args.num_layers, d_model=args.d_model, num_heads=args.num_heads,
        seq_len=args.seq_len, vocab=args.vocab, seed=args.seed,
    )
    task = LanguageModelingTask(num_layers=args.num_layers)

    def loss_fn(p, batch, key):
        total = task.compute_train_loss(batch, module.bind({"params": p}))
        return total / jnp.maximum(1.0, jnp.sum(batch["attention_mask"][:, 1:]))

    params = train_model(
        loss_fn, params, train_data, batch_size=args.batch_size,
        num_epochs=args.epochs, learning_rate=args.learning_rate,
        weight_decay=args.weight_decay, seed=args.seed,
    )

    train_loss = evaluate_loss(module, params, task, train_data, args.eval_batch_size)
    print(f"train perplexity: {math.exp(min(30.0, train_loss)):.3f}")
    eval_data = get_wikitext_dataset(
        "valid", args.num_eval, seq_len=args.seq_len, vocab=args.vocab, real=args.real
    )
    eval_loss = evaluate_loss(module, params, task, eval_data, args.eval_batch_size)
    print(f"evaluation perplexity: {math.exp(min(30.0, eval_loss)):.3f}")

    out = Path(args.checkpoint_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file(_flatten_params(params), out / "model.safetensors")
    print(f"saved checkpoint to {out / 'model.safetensors'}")


if __name__ == "__main__":
    main()
