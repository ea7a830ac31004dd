"""Trains the SWAG choice scorer and saves a checkpoint.

Reference analogue: /root/reference/examples/swag/train.py.

    python examples/swag/train.py --num_train 256 --epochs 3
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax.numpy as jnp
import numpy as np

from examples.common import train_model
from examples.swag.pipeline import construct_choice_model, get_swag_dataset
from kronfluence_tpu.analyzer import _flatten_params
from kronfluence_tpu.utils.save import save_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--learning_rate", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default=None, help="unused; smoke-test compat")
    parser.add_argument("--checkpoint_dir", default="./checkpoints/swag")
    args = parser.parse_args()

    train_data = get_swag_dataset("train", args.num_train, real=args.real)
    model, params, task = construct_choice_model(seed=args.seed)

    def loss_fn(p, batch, key):
        return task.compute_train_loss(batch, model.bind(p)) / len(batch["label"])

    params = train_model(
        loss_fn, params, train_data, batch_size=args.batch_size,
        num_epochs=args.epochs, learning_rate=args.learning_rate, seed=args.seed,
    )

    logits = model.bind(params)(
        jnp.asarray(train_data["input_ids"]), jnp.asarray(train_data["attention_mask"])
    )
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == train_data["label"]))
    print(f"train accuracy: {acc:.3f}")

    out = Path(args.checkpoint_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file(_flatten_params(params), out / "model.safetensors")
    print(f"saved checkpoint to {out / 'model.safetensors'}")


if __name__ == "__main__":
    main()
