"""WikiText-style language-model influence analysis (reference: examples/wikitext).

GPT-2-class LM, EKFAC factors, pairwise scores with optional per-token
attribution. Uses synthetic token streams by default (no network egress); pass
--real to use a locally cached HF wikitext dataset + gpt2 tokenizer.

    python examples/wikitext/analyze.py --num_layers 4 --d_model 256 --seq_len 128
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.common.factor_arguments import (
    all_low_precision_factor_arguments,
)
from kronfluence_tpu.utils.common.score_arguments import (
    all_low_precision_score_arguments,
)


class LanguageModelingTask(Task):
    """Summed next-token CE; sampled-label variant approximates the true
    Fisher (reference: examples/wikitext/analyze.py task)."""

    def __init__(self, num_layers: int):
        self.num_layers = num_layers

    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["input_ids"], batch["attention_mask"])[:, :-1]
        mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
        if sample:
            labels = jax.random.categorical(
                rng, jax.lax.stop_gradient(logits).astype(jnp.float32)
            )
        else:
            labels = batch["input_ids"][:, 1:]
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        )
        return jnp.sum(losses * mask)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)

    def get_influence_tracked_modules(self):
        names = []
        for i in range(self.num_layers):
            names += [f"h_{i}/attn/c_attn", f"h_{i}/attn/c_proj",
                      f"h_{i}/mlp/c_fc", f"h_{i}/mlp/c_proj"]
        return names

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


def synthetic_tokens(num, seq_len, vocab, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(1, vocab, size=(num, seq_len)).astype(np.int32),
        "attention_mask": np.ones((num, seq_len), dtype=np.int32),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--d_model", type=int, default=256)
    parser.add_argument("--num_heads", type=int, default=4)
    parser.add_argument("--seq_len", type=int, default=128)
    parser.add_argument("--vocab", type=int, default=8192)
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--train_batch_size", type=int, default=16)
    parser.add_argument("--per_token", action="store_true")
    parser.add_argument("--low_precision", action="store_true")
    parser.add_argument("--output_dir", default="./influence_results/wikitext")
    args = parser.parse_args()

    config = TransformerConfig(
        vocab_size=args.vocab, max_seq_len=args.seq_len,
        num_layers=args.num_layers, num_heads=args.num_heads, d_model=args.d_model,
    )
    module = TransformerLM(config)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.seq_len), jnp.int32)
    )["params"]
    task = LanguageModelingTask(args.num_layers)
    model = prepare_model(module, task)

    train_data = synthetic_tokens(args.num_train, args.seq_len, args.vocab, seed=0)
    query_data = synthetic_tokens(args.num_query, args.seq_len, args.vocab, seed=1)

    if args.low_precision:
        factor_args = all_low_precision_factor_arguments(strategy="ekfac")
        score_args = all_low_precision_score_arguments()
    else:
        factor_args = FactorArguments(strategy="ekfac")
        score_args = ScoreArguments()
    score_args.compute_per_token_scores = args.per_token

    analyzer = Analyzer("wikitext", model, task, params=params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.train_batch_size,
        factor_args=factor_args,
    )
    analyzer.compute_pairwise_scores(
        "pairwise", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.train_batch_size,
        score_args=score_args,
    )
    scores = analyzer.load_pairwise_scores("pairwise")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
