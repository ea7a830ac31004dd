"""Single-device ImageNet-style ResNet-50 influence analysis
(reference: examples/imagenet/analyze.py — the non-DDP twin of
ddp_analyze.py: EKFAC factor fit + rank-32 query-batched pairwise scores).

    python examples/imagenet/analyze.py --arch resnet9 --image_size 32
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from examples.imagenet.pipeline import ClassificationTask, synthetic_imagenet
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.models.resnet import ResNet9, resnet50


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="resnet50", choices=["resnet50", "resnet9"],
                        help="resnet9 is the CI smoke-test size")
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--num_classes", type=int, default=100)
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--train_batch_size", type=int, default=32)
    parser.add_argument("--query_batch_size", type=int, default=16)
    parser.add_argument("--query_gradient_low_rank", type=int, default=32,
                        help="None disables query batching (pass 0)")
    parser.add_argument("--output_dir", default="./influence_results/imagenet")
    args = parser.parse_args()

    if args.arch == "resnet9":
        module = ResNet9(num_classes=args.num_classes)
    else:
        module = resnet50(num_classes=args.num_classes)
    task = ClassificationTask()
    model = prepare_model(module, task)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.image_size, args.image_size, 3))
    )

    train_data = synthetic_imagenet(args.num_train, args.image_size, args.num_classes, 0)
    query_data = synthetic_imagenet(args.num_query, args.image_size, args.num_classes, 1)

    analyzer = Analyzer("imagenet", model, task, params=variables,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.train_batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    rank = args.query_gradient_low_rank or None
    analyzer.compute_pairwise_scores(
        "pairwise", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.query_batch_size,
        per_device_train_batch_size=args.train_batch_size,
        score_args=ScoreArguments(query_gradient_low_rank=rank),
    )
    scores = analyzer.load_pairwise_scores("pairwise")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
