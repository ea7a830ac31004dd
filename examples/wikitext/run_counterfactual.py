"""Counterfactual retraining for the LM: remove top-influence sequences.

Reference analogue: examples/wikitext/run_counterfactual.py:1-60 — for a
query passage, remove the k most-influential training sequences, retrain, and
compare the query's perplexity change against removing random sequences.

    python examples/wikitext/run_counterfactual.py --num_train 128 --remove 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from examples.common import train_model
from examples.wikitext.pipeline import (
    LanguageModelingTask,
    construct_gpt2,
    get_wikitext_dataset,
)
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_layers", type=int, default=2)
    parser.add_argument("--d_model", type=int, default=128)
    parser.add_argument("--num_heads", type=int, default=2)
    parser.add_argument("--seq_len", type=int, default=64)
    parser.add_argument("--vocab", type=int, default=1024)
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--remove", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=6)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seeds", type=int, default=2)
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/wikitext_cf")
    return parser.parse_args()


def train_lm(task, model, params, data, args, seed):
    def loss_fn(p, b, k):
        n_tok = b["attention_mask"][:, 1:].sum()
        return task.compute_train_loss(b, model.bind(p)) / jnp.maximum(n_tok, 1)

    return train_model(
        loss_fn, params, data, batch_size=args.batch_size,
        num_epochs=args.epochs, seed=seed, learning_rate=3e-4,
    )


def query_loss_per_token(task, model, params, query):
    batch = jax.tree_util.tree_map(jnp.asarray, query)
    total = task.compute_train_loss(batch, model.bind(params))
    n_tok = batch["attention_mask"][:, 1:].sum()
    return float(total) / float(n_tok)


def main():
    args = parse_args()
    task = LanguageModelingTask(args.num_layers)
    train = get_wikitext_dataset("train", args.num_train, args.seq_len, args.vocab, real=args.real)
    query = get_wikitext_dataset("validation", args.num_query, args.seq_len, args.vocab, real=args.real)

    module, params0 = construct_gpt2(
        args.num_layers, args.d_model, args.num_heads, args.seq_len, args.vocab
    )
    model = prepare_model(module, task)
    params = train_lm(task, model, params0, train, args, seed=0)

    analyzer = Analyzer("wikitext_cf", model, task, params=params,
                        output_dir=args.output_dir, disable_tqdm=True)
    analyzer.fit_all_factors(
        "ekfac", train, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"), overwrite_output_dir=True,
    )
    analyzer.compute_pairwise_scores(
        "cf", "ekfac", query, train,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(), overwrite_output_dir=True,
    )
    scores = analyzer.load_pairwise_scores("cf")["all_modules"]
    total = scores.sum(axis=0)
    most_positive = np.argsort(total)[::-1][: args.remove]
    all_idx = np.arange(args.num_train)
    rng = np.random.default_rng(0)

    results = {}
    for name in ("full dataset", "remove most-positive", "remove random"):
        losses = []
        for seed in range(args.seeds):
            if name == "full dataset":
                keep = all_idx
            elif name == "remove most-positive":
                keep = np.setdiff1d(all_idx, most_positive)
            else:
                keep = np.setdiff1d(
                    all_idx, rng.choice(all_idx, size=args.remove, replace=False)
                )
            module_s, params_s = construct_gpt2(
                args.num_layers, args.d_model, args.num_heads, args.seq_len,
                args.vocab, seed=seed,
            )
            model_s = prepare_model(module_s, task)
            sub = {k: v[keep] for k, v in train.items()}
            trained = train_lm(task, model_s, params_s, sub, args, seed)
            losses.append(query_loss_per_token(task, model_s, trained, query))
        results[name] = (float(np.mean(losses)), float(np.std(losses)))
        print(f"  {name:<24} query CE/token {results[name][0]:.4f} +- {results[name][1]:.4f}")

    base = results["full dataset"][0]
    pos = results["remove most-positive"][0]
    rand = results["remove random"][0]
    print(
        f"\nremoving most-positive changed CE by {pos - base:+.4f} "
        f"vs random {rand - base:+.4f}"
    )


if __name__ == "__main__":
    main()
