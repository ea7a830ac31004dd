"""GLUE (SST-2-style) pipeline: data + encoder classifier + task.

Reference analogue: /root/reference/examples/glue/pipeline.py
(get_glue_dataset with the bert-base tokenizer, construct_bert). No network
egress here, so the default is synthetic token sequences with realistic
padding and a learnable label signal; `real=True` loads a locally cached HF
`glue` copy when present.
"""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.transformer import TransformerConfig
from kronfluence_tpu.prepare import prepare_model
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
    """Summed CE + margin measurement (reference:
    examples/glue/pipeline.py:104-140 TextClassificationTask)."""

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


def synthetic_sst2(num, seq_len=64, vocab=4096, seed=0) -> Dict[str, np.ndarray]:
    """Synthetic SST-2-shaped batch: padded token ids + learnable labels."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, vocab, size=(num, seq_len)).astype(np.int32)
    lengths = rng.integers(8, seq_len + 1, size=num)
    mask = (np.arange(seq_len)[None] < lengths[:, None]).astype(np.int32)
    ids *= mask
    # Label correlates with presence of low token ids (learnable signal).
    label = (np.median(np.where(mask, ids, vocab), axis=1) < vocab // 2).astype(np.int32)
    return {"input_ids": ids, "attention_mask": mask, "label": label}


def get_sst2_dataset(split: str, num: int, seq_len: int = 64, vocab: int = 4096,
                     seed: int = 0, real: bool = False) -> Dict[str, np.ndarray]:
    """SST-2 as a column store; real path tokenizes a locally cached copy
    with bert-base-uncased (reference pipeline.py:33-63)."""
    if real:
        try:
            from datasets import load_dataset
            from transformers import AutoTokenizer

            ds = load_dataset("glue", "sst2", split="train" if split == "train" else "validation")
            ds = ds.select(range(min(num, len(ds))))
            tok = AutoTokenizer.from_pretrained("bert-base-uncased")
            enc = tok([ex for ex in ds["sentence"]], padding="max_length",
                      truncation=True, max_length=seq_len, return_tensors="np")
            return {
                "input_ids": enc["input_ids"].astype(np.int32),
                "attention_mask": enc["attention_mask"].astype(np.int32),
                "label": np.asarray(ds["label"], dtype=np.int32),
            }
        except Exception as exc:
            print(f"real SST-2 unavailable ({exc}); using synthetic data")
    return synthetic_sst2(num, seq_len=seq_len, vocab=vocab, seed=seed)


def construct_classifier(seq_len: int = 64, vocab: int = 4096, num_layers: int = 2,
                         num_heads: int = 4, d_model: int = 128, seed: int = 0):
    """Builds the encoder classifier; returns (model, params, task)."""
    config = TransformerConfig(vocab_size=vocab, max_seq_len=seq_len,
                               num_layers=num_layers, num_heads=num_heads,
                               d_model=d_model)
    module = EncoderClassifier(config)
    task = TextClassificationTask()
    model = prepare_model(module, task)
    params = module.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, seq_len), jnp.int32), jnp.ones((1, seq_len), jnp.int32),
    )["params"]
    return model, params, task
