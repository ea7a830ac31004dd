"""Trains the summarization model and saves a checkpoint.

Reference analogue: /root/reference/examples/dailymail/train.py (3-epoch AdamW
fine-tune of T5-small; checkpoint reloaded by analyze.py / inspect_examples.py).

    python examples/dailymail/train.py --num_train 128 --epochs 3
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax.numpy as jnp
import numpy as np

from examples.common import train_model
from examples.dailymail.pipeline import construct_seq2seq, get_dailymail_dataset
from kronfluence_tpu.analyzer import _flatten_params
from kronfluence_tpu.utils.save import save_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--learning_rate", type=float, default=5e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default=None, help="unused; smoke-test compat")
    parser.add_argument("--checkpoint_dir", default="./checkpoints/dailymail")
    args = parser.parse_args()

    train_data = get_dailymail_dataset("train", args.num_train, real=args.real)
    model, params, task = construct_seq2seq(seed=args.seed)

    def loss_fn(p, batch, key):
        return task.compute_train_loss(batch, model.bind(p)) / len(batch["input_ids"])

    params = train_model(
        loss_fn, params, train_data, batch_size=args.batch_size,
        num_epochs=args.epochs, learning_rate=args.learning_rate, seed=args.seed,
    )

    # Report final per-token loss on the training data.
    loss = float(
        task.compute_train_loss(
            {k: jnp.asarray(v) for k, v in train_data.items()}, model.bind(params)
        )
    ) / float(np.sum(train_data["decoder_attention_mask"][:, 1:]))
    print(f"final train loss/token: {loss:.4f}")

    out = Path(args.checkpoint_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file(_flatten_params(params), out / "model.safetensors")
    print(f"saved checkpoint to {out / 'model.safetensors'}")


if __name__ == "__main__":
    main()
