"""Counterfactual retraining for GLUE: remove top-influence training
examples and measure the query-loss change.

Reference analogue: /root/reference/examples/glue/run_counterfactual.py —
for a set of query sentences, drop the k most-influential (by summed
pairwise score) training examples, retrain from scratch, and compare the
mean query loss against dropping k random examples. Influence-guided
removal should hurt the queries measurably more.

    python examples/glue/run_counterfactual.py --num_train 256 --remove 32
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax.numpy as jnp
import numpy as np

from examples.common import train_model
from examples.glue.pipeline import construct_classifier, get_sst2_dataset
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments


def train_classifier(model, task, params0, data, args, seed):
    def loss_fn(p, batch, key):
        return task.compute_train_loss(batch, model.bind(p)) / len(batch["label"])

    return train_model(
        loss_fn, params0, data, batch_size=args.batch_size,
        num_epochs=args.epochs, learning_rate=3e-4, seed=seed,
    )


def query_loss(model, task, params, query):
    batch = {k: jnp.asarray(v) for k, v in query.items()}
    return float(task.compute_train_loss(batch, model.bind(params))) / len(
        query["label"]
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--remove", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seeds", type=int, default=2)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/glue_cf")
    args = parser.parse_args()

    train_data = get_sst2_dataset("train", args.num_train, real=args.real)
    query_data = get_sst2_dataset("eval", args.num_query, seed=1, real=args.real)
    model, params0, task = construct_classifier()
    params = train_classifier(model, task, params0, train_data, args, seed=0)

    analyzer = Analyzer("glue_cf", model, task, params=params,
                        output_dir=args.output_dir)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_pairwise_scores(
        "cf", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(),
    )
    scores = analyzer.load_pairwise_scores("cf")["all_modules"]
    summed = np.asarray(scores, dtype=np.float64).sum(axis=0)
    top_idx = np.argsort(summed)[::-1][: args.remove]

    def retrain_without(drop_idx, seed):
        keep = np.setdiff1d(np.arange(args.num_train), drop_idx)
        sub = {k: v[keep] for k, v in train_data.items()}
        p = train_classifier(model, task, params0, sub, args, seed=seed)
        return query_loss(model, task, p, query_data)

    base = np.mean([
        query_loss(
            model, task,
            train_classifier(model, task, params0, train_data, args, seed=s),
            query_data,
        )
        for s in range(args.seeds)
    ])
    infl = np.mean([retrain_without(top_idx, seed=s) for s in range(args.seeds)])
    rng = np.random.default_rng(0)
    rand = np.mean([
        retrain_without(
            rng.choice(args.num_train, args.remove, replace=False), seed=s
        )
        for s in range(args.seeds)
    ])

    print(f"query loss — full train set:         {base:.4f}")
    print(f"query loss — remove {args.remove} random:     {rand:.4f}")
    print(f"query loss — remove {args.remove} top-influence: {infl:.4f}")
    print(f"influence removal hurts {infl - rand:+.4f} more than random")


if __name__ == "__main__":
    main()
