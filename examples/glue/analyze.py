"""GLUE-style text-classification influence analysis (reference: examples/glue).

Encoder transformer + classification head on synthetic token sequences with
realistic padding (attention masks exercised end-to-end), EKFAC factors,
pairwise scores.

    python examples/glue/analyze.py --num_train 256
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
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.task import Task


class EncoderClassifier(nn.Module):
    """Transformer trunk + mean-pool + classifier (BERT-style workload)."""

    config: TransformerConfig
    num_classes: int = 2

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        from kronfluence_tpu.models.transformer import Block

        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.d_model, name="wte")(input_ids)
        pos = nn.Embed(cfg.max_seq_len, cfg.d_model, name="wpe")(
            jnp.arange(input_ids.shape[1])[None]
        )
        x = tok + pos
        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"h_{i}")(x, attention_mask)
        x = nn.LayerNorm(name="ln_f")(x)
        mask = attention_mask[:, :, None].astype(x.dtype)
        pooled = jnp.sum(x * mask, axis=1) / jnp.sum(mask, axis=1)
        return nn.Dense(self.num_classes, name="classifier")(pooled)


class TextClassificationTask(Task):
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

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


def synthetic_sst2(num, seq_len=64, vocab=4096, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, vocab, size=(num, seq_len)).astype(np.int32)
    lengths = rng.integers(8, seq_len + 1, size=num)
    mask = (np.arange(seq_len)[None] < lengths[:, None]).astype(np.int32)
    ids *= mask
    # Label correlates with presence of low token ids (learnable signal).
    label = (np.median(np.where(mask, ids, vocab), axis=1) < vocab // 2).astype(np.int32)
    return {"input_ids": ids, "attention_mask": mask, "label": label}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--output_dir", default="./influence_results/glue")
    args = parser.parse_args()

    config = TransformerConfig(vocab_size=4096, max_seq_len=64, num_layers=2,
                               num_heads=4, d_model=128)
    module = EncoderClassifier(config)
    task = TextClassificationTask()
    model = prepare_model(module, task)
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32),
    )["params"]

    train_data = synthetic_sst2(args.num_train, seed=0)
    query_data = synthetic_sst2(args.num_query, seed=1)

    analyzer = Analyzer("glue", model, task, params=params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_pairwise_scores(
        "pairwise", "ekfac", query_data, train_data,
        per_device_query_batch_size=args.num_query,
        per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(),
    )
    scores = analyzer.load_pairwise_scores("pairwise")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
