"""CNN/DailyMail-style seq2seq influence analysis (reference: examples/dailymail).

Encoder-decoder (T5-class) summarization-style task with *dict* attention
masks: encoder modules are masked/counted by the article mask, decoder modules
by the summary mask.

    python examples/dailymail/analyze.py --num_train 128
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
from kronfluence_tpu.models.encoder_decoder import EncDecConfig, EncDecLM
from kronfluence_tpu.task import Task


class SummarizationTask(Task):
    def __init__(self, num_layers: int):
        self.num_layers = num_layers

    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(
            batch["input_ids"], batch["decoder_input_ids"],
            batch["attention_mask"], batch["decoder_attention_mask"],
        )[:, :-1]
        mask = batch["decoder_attention_mask"][:, 1:].astype(jnp.float32)
        if sample:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        else:
            labels = batch["decoder_input_ids"][:, 1:]
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        )
        return jnp.sum(losses * mask)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)

    def get_attention_mask(self, batch):
        # Dict form routes the right mask to each module
        # (reference task.py:83-99, dailymail example).
        masks = {}
        enc, dec = batch["attention_mask"], batch["decoder_attention_mask"]
        for i in range(self.num_layers):
            for sub in ("attn/q", "attn/k", "attn/v", "attn/o", "mlp/wi", "mlp/wo"):
                masks[f"encoder_{i}/{sub}"] = enc
            for sub in ("self_attn/q", "self_attn/k", "self_attn/v", "self_attn/o",
                        "mlp/wi", "mlp/wo", "cross_attn/q", "cross_attn/o"):
                masks[f"decoder_{i}/{sub}"] = dec
            for sub in ("cross_attn/k", "cross_attn/v"):
                masks[f"decoder_{i}/{sub}"] = enc
        masks["lm_head"] = dec
        return masks


def synthetic_pairs(num, seq_len=32, vocab=1024, seed=0):
    rng = np.random.default_rng(seed)
    enc_ids = rng.integers(1, vocab, size=(num, seq_len)).astype(np.int32)
    dec_ids = rng.integers(1, vocab, size=(num, seq_len)).astype(np.int32)
    enc_len = rng.integers(seq_len // 2, seq_len + 1, size=num)
    dec_len = rng.integers(seq_len // 4, seq_len + 1, size=num)
    enc_mask = (np.arange(seq_len)[None] < enc_len[:, None]).astype(np.int32)
    dec_mask = (np.arange(seq_len)[None] < dec_len[:, None]).astype(np.int32)
    return {
        "input_ids": enc_ids * enc_mask,
        "decoder_input_ids": dec_ids * dec_mask,
        "attention_mask": enc_mask,
        "decoder_attention_mask": dec_mask,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=128)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--output_dir", default="./influence_results/dailymail")
    args = parser.parse_args()

    config = EncDecConfig(vocab_size=1024, max_seq_len=32, num_layers=2,
                          num_heads=4, d_model=128)
    module = EncDecLM(config)
    task = SummarizationTask(config.num_layers)
    model = prepare_model(module, task)
    ids0 = jnp.zeros((1, 32), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids0, ids0)["params"]

    train_data = synthetic_pairs(args.num_train, seed=0)
    query_data = synthetic_pairs(args.num_query, seed=1)

    analyzer = Analyzer("dailymail", model, task, params=params,
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
