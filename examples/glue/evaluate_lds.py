"""Linear datamodeling score (LDS) evaluation for the GLUE-style example.

Counterfactual check of influence-score quality (reference:
examples/glue/evaluate_lds.py; published LDS table at
examples/glue/README.md:130-141 — identity 0.10 < kfac/ekfac 0.32): retrain
on random train subsets and rank-correlate the measured query margins against
the subset-summed pairwise scores.

    python examples/glue/evaluate_lds.py --num_train 128 --num_subsets 32
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.evaluate import (
    collect_subset_measurements,
    evaluate_lds,
    sample_subset_masks,
)

from examples.common import train_model
from examples.glue.pipeline import TextClassificationTask, synthetic_sst2


def _build_module():
    from kronfluence_tpu.models.transformer import TransformerConfig

    from examples.glue.pipeline import EncoderClassifier

    config = TransformerConfig(
        vocab_size=4096, max_seq_len=64, num_layers=2, num_heads=4, d_model=128
    )
    return EncoderClassifier(config)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--num_subsets", type=int, default=32)
    parser.add_argument("--subset_fraction", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--output_dir", default="./influence_results/glue_lds")
    parser.add_argument("--strategies", nargs="+", default=["ekfac", "identity"])
    args = parser.parse_args()

    train_data = synthetic_sst2(args.num_train, seed=0)
    query_data = synthetic_sst2(args.num_query, seed=1)
    module = _build_module()
    task = TextClassificationTask()
    model = prepare_model(module, task)

    ids0 = jnp.asarray(train_data["input_ids"][:1])
    mask0 = jnp.asarray(train_data["attention_mask"][:1])

    def init_params(seed):
        return module.init(jax.random.PRNGKey(seed), ids0, mask0)["params"]

    def loss_fn(params, batch, key):
        del key
        return task.compute_train_loss(batch, lambda *a: module.apply({"params": params}, *a))

    def train_on(data, seed):
        return train_model(
            loss_fn, init_params(0), data, batch_size=args.batch_size,
            num_epochs=args.epochs, seed=seed,
        )

    params_full = train_on(train_data, seed=0)

    def train_fn(idx, seed):
        subset = {k: v[idx] for k, v in train_data.items()}
        return train_on(subset, seed=0)  # fixed seed: subset is the treatment

    def measure_fn(params):
        # Negative per-query loss ("margin"): higher is better.
        losses = []
        for i in range(args.num_query):
            batch = {k: v[i : i + 1] for k, v in query_data.items()}
            losses.append(
                float(task.compute_train_loss(batch, lambda *a: module.apply({"params": params}, *a)))
            )
        return -np.asarray(losses)

    masks = sample_subset_masks(
        args.num_train, args.num_subsets, args.subset_fraction, seed=3
    )
    # Retrains are score-independent: run them once, reuse per strategy.
    measurements = collect_subset_measurements(train_fn, measure_fn, masks, seed=3)
    for strategy in args.strategies:
        analyzer = Analyzer(
            f"glue_lds_{strategy}", model, task, params=params_full,
            output_dir=args.output_dir,
        )
        analyzer.fit_all_factors(
            "factors", train_data, per_device_batch_size=args.batch_size,
            factor_args=FactorArguments(strategy=strategy, use_empirical_fisher=True),
        )
        analyzer.compute_pairwise_scores(
            "scores", "factors", query_data, train_data,
            per_device_query_batch_size=args.num_query,
            per_device_train_batch_size=args.batch_size,
            score_args=ScoreArguments(),
        )
        scores = analyzer.load_pairwise_scores("scores")["all_modules"]
        lds, per_query = evaluate_lds(
            scores, train_fn, measure_fn, args.num_train, masks=masks,
            measurements=measurements
        )
        print(f"LDS[{strategy}] = {lds:.4f} (per-query mean of {len(per_query)})")


if __name__ == "__main__":
    main()
