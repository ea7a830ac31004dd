"""WikiText-2 language-modeling pipeline: data + GPT-2-class model + task.

Reference analogue: /root/reference/examples/wikitext/pipeline.py
(get_wikitext_dataset with gpt2 tokenizer, construct_gpt2 model; the Task
lives in analyze.py there). Real data loads from a locally cached HF dataset
when available — this environment has no network egress — and a synthetic
token stream with matched shapes is the default.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.task import Task


class LanguageModelingTask(Task):
    """Summed next-token CE; sampled-label variant approximates the true
    Fisher (reference: examples/wikitext/analyze.py task, which mirrors
    examples/openwebtext/task.py:13-38)."""

    def __init__(self, num_layers: int, track: str = "all"):
        self.num_layers = num_layers
        self.track = track  # "all" or "mlp"

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

    def get_influence_tracked_modules(self) -> Optional[List[str]]:
        names = []
        for i in range(self.num_layers):
            if self.track == "all":
                names += [f"h_{i}/attn/c_attn", f"h_{i}/attn/c_proj"]
            names += [f"h_{i}/mlp/c_fc", f"h_{i}/mlp/c_proj"]
        return names

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


def synthetic_tokens(num: int, seq_len: int, vocab: int, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(1, vocab, size=(num, seq_len)).astype(np.int32),
        "attention_mask": np.ones((num, seq_len), dtype=np.int32),
    }


def get_wikitext_dataset(
    split: str,
    num: int,
    seq_len: int = 512,
    vocab: int = 50257,
    seed: int = 0,
    real: bool = False,
) -> Dict[str, np.ndarray]:
    """Tokenized WikiText-2 chunks (real, from local HF cache) or synthetic.

    Real path matches the reference recipe: concatenate, chunk to `seq_len`
    blocks (reference pipeline.py group_texts). 4,656 train / 481 eval chunks
    at seq_len 512.
    """
    if real:
        try:
            from datasets import load_dataset
            from transformers import AutoTokenizer

            ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
            tok = AutoTokenizer.from_pretrained("gpt2")
            ids: List[int] = []
            for row in ds["text"]:
                ids.extend(tok(row)["input_ids"])
            n_chunks = min(num, len(ids) // seq_len)
            arr = np.asarray(ids[: n_chunks * seq_len], np.int32).reshape(-1, seq_len)
            return {
                "input_ids": arr,
                "attention_mask": np.ones_like(arr),
            }
        except Exception as exc:  # no cache/egress: fall back loudly
            print(f"[wikitext] real data unavailable ({exc}); using synthetic tokens")
    return synthetic_tokens(num, seq_len, vocab, seed=seed + (0 if split == "train" else 1))


def construct_gpt2(
    num_layers: int = 12,
    d_model: int = 768,
    num_heads: int = 12,
    seq_len: int = 512,
    vocab: int = 50257,
    seed: int = 0,
):
    """GPT-2-small-shaped TransformerLM (the bench/flagship model)."""
    config = TransformerConfig(
        vocab_size=vocab, max_seq_len=seq_len,
        num_layers=num_layers, num_heads=num_heads, d_model=d_model,
    )
    module = TransformerLM(config)
    params = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, seq_len), jnp.int32)
    )["params"]
    return module, params
