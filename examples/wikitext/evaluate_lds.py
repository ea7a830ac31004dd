"""Linear datamodeling score (LDS) evaluation for the WikiText-style example.

Counterfactual check of influence-score quality on the language-modeling
workload (reference: examples/wikitext/README.md:108-112 — LDS 0.44 ekfac vs
0.12 identity over 500 retrains): retrain the LM on random train subsets and
rank-correlate the measured query log-likelihoods against the subset-summed
pairwise scores.

    python examples/wikitext/evaluate_lds.py --num_train 128 --num_subsets 32
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
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM

from examples.common import train_model
from examples.wikitext.analyze import LanguageModelingTask, synthetic_tokens


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_layers", type=int, default=2)
    parser.add_argument("--d_model", type=int, default=64)
    parser.add_argument("--num_heads", type=int, default=2)
    parser.add_argument("--seq_len", type=int, default=32)
    parser.add_argument("--vocab", type=int, default=512)
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--num_subsets", type=int, default=32)
    parser.add_argument("--subset_fraction", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--output_dir", default="./influence_results/wikitext_lds")
    parser.add_argument("--strategies", nargs="+", default=["ekfac", "identity"])
    args = parser.parse_args()

    config = TransformerConfig(
        vocab_size=args.vocab, max_seq_len=args.seq_len,
        num_layers=args.num_layers, num_heads=args.num_heads, d_model=args.d_model,
    )
    module = TransformerLM(config)
    task = LanguageModelingTask(args.num_layers)
    model = prepare_model(module, task)
    train_data = synthetic_tokens(args.num_train, args.seq_len, args.vocab, seed=0)
    query_data = synthetic_tokens(args.num_query, args.seq_len, args.vocab, seed=1)

    ids0 = jnp.zeros((1, args.seq_len), jnp.int32)
    base_params = module.init(jax.random.PRNGKey(0), ids0)["params"]

    def loss_fn(params, batch, key):
        del key
        return task.compute_train_loss(
            batch, lambda *a: module.apply({"params": params}, *a)
        )

    def train_on(data):
        return train_model(
            loss_fn, base_params, data, batch_size=args.batch_size,
            num_epochs=args.epochs, seed=0,
        )

    params_full = train_on(train_data)

    def train_fn(idx, seed):
        subset = {k: v[idx] for k, v in train_data.items()}
        return train_on(subset)

    def measure_fn(params):
        losses = []
        for i in range(args.num_query):
            batch = {k: v[i : i + 1] for k, v in query_data.items()}
            losses.append(
                float(
                    task.compute_train_loss(
                        batch, lambda *a: module.apply({"params": params}, *a)
                    )
                )
            )
        return -np.asarray(losses)

    masks = sample_subset_masks(
        args.num_train, args.num_subsets, args.subset_fraction, seed=3
    )
    # The retrains are the expensive half and are score-independent: run
    # them ONCE and reuse the (M, Q) measurement matrix for every strategy.
    measurements = collect_subset_measurements(train_fn, measure_fn, masks, seed=3)
    for strategy in args.strategies:
        analyzer = Analyzer(
            f"wikitext_lds_{strategy}", model, task, params=params_full,
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
            measurements=measurements,
        )
        print(f"LDS[{strategy}] = {lds:.4f} (per-query mean of {len(per_query)})")


if __name__ == "__main__":
    main()
