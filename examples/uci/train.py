"""Trains the UCI regression MLP and saves a checkpoint.

Reference analogue: /root/reference/examples/uci/train.py (argparse trainer
that persists a model checkpoint which analyze.py reloads).

    python examples/uci/train.py --num_train 512 --epochs 20 \
        --checkpoint_dir ./checkpoints/uci
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.common import train_model
from examples.uci.pipeline import (
    RegressionTask,
    construct_regression_mlp,
    get_regression_dataset,
)
from kronfluence_tpu import prepare_model


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=512)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint_dir", default="./checkpoints/uci")
    parser.add_argument("--output_dir", default=None, help="unused; smoke-test compat")
    return parser.parse_args()


def main():
    args = parse_args()
    train_data = get_regression_dataset("train", args.num_train, seed=args.seed)
    module, params = construct_regression_mlp(seed=args.seed)
    task = RegressionTask()
    model = prepare_model(module, task)
    params = train_model(
        lambda p, b, k: task.compute_train_loss(b, model.bind(p)) / len(b["y"]),
        params,
        train_data,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        learning_rate=args.learning_rate,
        seed=args.seed,
    )
    out = Path(args.checkpoint_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "model.pkl", "wb") as f:
        pickle.dump(params, f)
    print(f"Saved checkpoint to {out / 'model.pkl'}")


if __name__ == "__main__":
    main()
