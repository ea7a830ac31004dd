"""SWAG multiple-choice pipeline: data + choice-scoring model + task.

Reference analogue: /root/reference/examples/swag/pipeline.py
(get_swag_dataset folding 4 candidate endings per example with the
roberta-base tokenizer, construct_roberta). No network egress here, so the
default is synthetic (question, 4-endings) token tensors; `real=True` loads
a locally cached HF `swag` copy when present.

The workload's signature behaviors: the encoder runs 4x per example (choices
folded into the batch — per-sample gradients must be summed back per
example via `post_process_per_sample_gradient`), and query batching with
low-rank SVD (the reference's RoBERTa/SWAG headline optimization).
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

NUM_CHOICES = 4


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
    # (reference: examples/swag/pipeline.py:118-131).
    enable_post_process_per_sample_gradient = True

    def post_process_per_sample_gradient(self, module_name, gradient):
        del module_name
        true_batch = gradient.shape[0] // NUM_CHOICES
        return gradient.reshape(
            true_batch, NUM_CHOICES, *gradient.shape[1:]
        ).sum(axis=1)

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


def synthetic_swag(num, num_choices=NUM_CHOICES, seq_len=32, vocab=2048, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(num, num_choices, seq_len)).astype(np.int32)
    mask = np.ones((num, num_choices, seq_len), dtype=np.int32)
    label = rng.integers(0, num_choices, size=num).astype(np.int32)
    return {"input_ids": ids, "attention_mask": mask, "label": label}


def get_swag_dataset(split: str, num: int, seq_len: int = 32, vocab: int = 2048,
                     seed: int = 0, real: bool = False) -> Dict[str, np.ndarray]:
    """SWAG as a column store {input_ids/attention_mask: (N,4,T), label: (N,)}."""
    if real:
        try:
            from datasets import load_dataset
            from transformers import AutoTokenizer

            ds = load_dataset("swag", "regular",
                              split="train" if split == "train" else "validation")
            ds = ds.select(range(min(num, len(ds))))
            tok = AutoTokenizer.from_pretrained("roberta-base")
            endings = ["ending0", "ending1", "ending2", "ending3"]
            ids, masks = [], []
            for ex in ds:
                texts = [f"{ex['sent1']} {ex['sent2']} {ex[e]}" for e in endings]
                enc = tok(texts, padding="max_length", truncation=True,
                          max_length=seq_len, return_tensors="np")
                ids.append(enc["input_ids"])
                masks.append(enc["attention_mask"])
            return {
                "input_ids": np.stack(ids).astype(np.int32),
                "attention_mask": np.stack(masks).astype(np.int32),
                "label": np.asarray(ds["label"], dtype=np.int32),
            }
        except Exception as exc:
            print(f"real SWAG unavailable ({exc}); using synthetic data")
    return synthetic_swag(num, seq_len=seq_len, vocab=vocab, seed=seed)


def construct_choice_model(seq_len: int = 32, vocab: int = 2048,
                           num_layers: int = 2, num_heads: int = 4,
                           d_model: int = 128, seed: int = 0):
    """Builds the choice scorer; returns (model, params, task)."""
    config = TransformerConfig(vocab_size=vocab, max_seq_len=seq_len,
                               num_layers=num_layers, num_heads=num_heads,
                               d_model=d_model)
    module = ChoiceScorer(config)
    task = MultipleChoiceTask()
    model = prepare_model(module, task)
    ids0 = jnp.zeros((1, NUM_CHOICES, seq_len), jnp.int32)
    params = module.init(jax.random.PRNGKey(seed), ids0, jnp.ones_like(ids0))["params"]
    return model, params, task
