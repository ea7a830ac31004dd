"""Trains ResNet-9 on CIFAR-10(-shaped) data and saves the checkpoint.

Reference analogue: /root/reference/examples/cifar/train.py (SGD recipe,
checkpoint to --checkpoint_dir). The analysis scripts reload this checkpoint
instead of retraining.

    python examples/cifar/train.py --num_train 1024 --epochs 10
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.cifar.pipeline import get_cifar10_dataset, train_resnet9
from kronfluence_tpu.analyzer import _flatten_params
from kronfluence_tpu.utils.save import save_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--corrupt_frac", type=float, default=0.0)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default=None, help="unused; smoke-test compat")
    parser.add_argument("--checkpoint_dir", default="./checkpoints/cifar")
    args = parser.parse_args()

    train_data, corrupt_idx = get_cifar10_dataset(
        "train", args.num_train, corrupt_frac=args.corrupt_frac, real=args.real
    )
    variables, _, _ = train_resnet9(
        train_data,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
    )

    out = Path(args.checkpoint_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file(_flatten_params(variables), out / "model.safetensors")
    if len(corrupt_idx):
        import numpy as np

        np.save(out / "corrupt_idx.npy", corrupt_idx)
    print(f"saved checkpoint to {out / 'model.safetensors'}")


if __name__ == "__main__":
    main()
