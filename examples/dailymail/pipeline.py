"""CNN/DailyMail pipeline: seq2seq data + encoder-decoder model + task.

Reference analogue: /root/reference/examples/dailymail/pipeline.py
(T5-small with the `summarize:` prefix over cnn_dailymail 3.0.0). No network
egress here, so the default is synthetic article/summary pairs with realistic
padding; `real=True` tokenizes a locally cached HF copy when present.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.encoder_decoder import EncDecConfig, EncDecLM
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task

MODEL_NAME = "google-t5/t5-small"


class SummarizationTask(Task):
    """Summed masked CE over decoder positions with dict attention masks:
    encoder modules masked by the article mask, decoder modules by the summary
    mask, cross-attention K/V by the article mask (reference:
    examples/dailymail/pipeline.py SummarizationTask + task.py:83-99)."""

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


def synthetic_pairs(num, seq_len=32, vocab=1024, seed=0) -> Dict[str, np.ndarray]:
    """Synthetic article/summary pairs: padded ids shaped like tokenized
    cnn_dailymail (articles longer than summaries)."""
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


def get_dailymail_dataset(split: str, num: int, enc_len: int = 32, dec_len: int = 32,
                          vocab: int = 1024, seed: int = 0,
                          real: bool = False) -> Dict[str, np.ndarray]:
    """cnn_dailymail as a column store; the real path tokenizes a locally
    cached copy with the T5 tokenizer and `summarize:` prefix (reference
    pipeline.py:44-100)."""
    if real:
        try:
            from datasets import load_dataset
            from transformers import AutoTokenizer

            hf_split = "train" if split == "train" else "validation"
            ds = load_dataset("cnn_dailymail", "3.0.0", split=hf_split)
            ds = ds.select(range(min(num, len(ds))))
            tok = AutoTokenizer.from_pretrained(MODEL_NAME, use_fast=True)
            enc = tok(["summarize: " + a for a in ds["article"]],
                      padding="max_length", truncation=True, max_length=enc_len,
                      return_tensors="np")
            dec = tok(list(ds["highlights"]), padding="max_length",
                      truncation=True, max_length=dec_len, return_tensors="np")
            return {
                "input_ids": enc["input_ids"].astype(np.int32),
                "decoder_input_ids": dec["input_ids"].astype(np.int32),
                "attention_mask": enc["attention_mask"].astype(np.int32),
                "decoder_attention_mask": dec["attention_mask"].astype(np.int32),
            }
        except Exception as exc:
            print(f"real cnn_dailymail unavailable ({exc}); using synthetic data")
    return synthetic_pairs(num, seq_len=enc_len, vocab=vocab, seed=seed)


def construct_seq2seq(seq_len: int = 32, vocab: int = 1024, num_layers: int = 2,
                      num_heads: int = 4, d_model: int = 128, seed: int = 0):
    """Builds the encoder-decoder LM; returns (model, params, task)."""
    config = EncDecConfig(vocab_size=vocab, max_seq_len=seq_len,
                          num_layers=num_layers, num_heads=num_heads,
                          d_model=d_model)
    module = EncDecLM(config)
    task = SummarizationTask(config.num_layers)
    model = prepare_model(module, task)
    ids0 = jnp.zeros((1, seq_len), jnp.int32)
    params = module.init(jax.random.PRNGKey(seed), ids0, ids0)["params"]
    return model, params, task
