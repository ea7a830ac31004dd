"""SWAG-style multiple-choice influence analysis (reference: examples/swag).

Each example has 4 candidate endings; the model scores each (question, ending)
pair with a shared encoder and picks the max — exercising shared-parameter
capture (the encoder runs 4x per example) and query batching with low-rank
SVD (the reference's RoBERTa/SWAG headline optimization).

    python examples/swag/analyze.py --num_train 128 --query_gradient_low_rank 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.models.transformer import TransformerConfig
from kronfluence_tpu.task import Task


class ChoiceScorer(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        """input_ids: (batch, num_choices, seq) -> (batch, num_choices) logits."""
        from kronfluence_tpu.models.transformer import Block

        cfg = self.config
        b, c, t = input_ids.shape
        ids = input_ids.reshape(b * c, t)
        mask = attention_mask.reshape(b * c, t)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="wte")(ids)
        x = x + nn.Embed(cfg.max_seq_len, cfg.d_model, name="wpe")(
            jnp.arange(t)[None]
        )
        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"h_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_f")(x)
        m = mask[:, :, None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.sum(m, axis=1)
        return nn.Dense(1, name="scorer")(pooled).reshape(b, c)


class MultipleChoiceTask(Task):
    # Choices are folded into the batch inside the model; per-sample
    # gradients must sum back to one gradient per example
    # (reference: examples/swag/analyze.py:143-147).
    enable_post_process_per_sample_gradient = True

    def post_process_per_sample_gradient(self, module_name, gradient):
        del module_name
        true_batch = gradient.shape[0] // 4
        return gradient.reshape(true_batch, 4, *gradient.shape[1:]).sum(axis=1)

    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["input_ids"], batch["attention_mask"])
        if sample:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        else:
            labels = batch["label"]
        return jnp.sum(optax.softmax_cross_entropy_with_integer_labels(logits, labels))

    def compute_measurement(self, batch, model):
        logits = model(batch["input_ids"], batch["attention_mask"])
        labels = batch["label"]
        bindex = jnp.arange(logits.shape[0])
        correct = logits[bindex, labels]
        cloned = logits.at[bindex, labels].set(-jnp.inf)
        return -jnp.sum(correct - jax.nn.logsumexp(cloned, axis=-1))


def synthetic_swag(num, num_choices=4, seq_len=32, vocab=2048, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(num, num_choices, seq_len)).astype(np.int32)
    mask = np.ones((num, num_choices, seq_len), dtype=np.int32)
    label = rng.integers(0, num_choices, size=num).astype(np.int32)
    return {"input_ids": ids, "attention_mask": mask, "label": label}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--query_gradient_low_rank", type=int, default=16)
    parser.add_argument("--output_dir", default="./influence_results/swag")
    args = parser.parse_args()

    config = TransformerConfig(vocab_size=2048, max_seq_len=32, num_layers=2,
                               num_heads=4, d_model=128)
    module = ChoiceScorer(config)
    task = MultipleChoiceTask()
    model = prepare_model(module, task)
    ids0 = jnp.zeros((1, 4, 32), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]

    train_data = synthetic_swag(args.num_train, seed=0)
    query_data = synthetic_swag(args.num_query, seed=1)

    analyzer = Analyzer("swag", model, task, params=params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_pairwise_scores(
        "pairwise_qb", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(query_gradient_low_rank=args.query_gradient_low_rank),
    )
    scores = analyzer.load_pairwise_scores("pairwise_qb")["all_modules"]
    print(f"pairwise scores (low-rank queries): {scores.shape}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
