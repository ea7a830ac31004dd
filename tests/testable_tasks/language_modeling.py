"""Language-modeling testable task: tiny transformer + synthetic tokens.

Mirrors reference tests/testable_tasks/language_modeling.py and the
wikitext/openwebtext task shape (examples/openwebtext/task.py:13-38): summed
next-token cross-entropy, sampled-label true-Fisher variant, attention masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.transformer import TransformerLM, tiny_config
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task


class LanguageModelingTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["input_ids"], batch.get("attention_mask"))
        logits = logits[:, :-1]
        mask = batch["attention_mask"][:, 1:].astype(logits.dtype)
        if not sample:
            labels = batch["input_ids"][:, 1:]
        else:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(losses * mask)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model, sample=False)

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


class MLPOnlyLanguageModelingTask(LanguageModelingTask):
    """Tracks only MLP projections (openwebtext/task.py:53-68 analogue)."""

    def __init__(self, num_layers: int):
        self.num_layers = num_layers

    def get_influence_tracked_modules(self):
        names = []
        for i in range(self.num_layers):
            names.append(f"h_{i}/mlp/c_fc")
            names.append(f"h_{i}/mlp/c_proj")
        return names


def make_lm_data(num: int, seq_len: int = 16, vocab: int = 128, seed: int = 0,
                 variable_lengths: bool = True):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(num, seq_len))
    mask = np.ones((num, seq_len), dtype=np.int32)
    if variable_lengths:
        lengths = rng.integers(seq_len // 2, seq_len + 1, size=(num,))
        for i, L in enumerate(lengths):
            mask[i, L:] = 0
            ids[i, L:] = 0
    return {"input_ids": ids.astype(np.int32), "attention_mask": mask}


def make_lm(seed: int = 0, mlp_only: bool = False, **config_overrides):
    config_overrides.setdefault("dtype", jnp.float64)
    config_overrides.setdefault("param_dtype", jnp.float64)
    config = tiny_config(**config_overrides)
    module = TransformerLM(config)
    ids = jnp.zeros((1, config.max_seq_len), jnp.int32)
    params = module.init(jax.random.PRNGKey(seed), ids)["params"]
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.float64), params)
    task = (
        MLPOnlyLanguageModelingTask(config.num_layers)
        if mlp_only
        else LanguageModelingTask()
    )
    model = prepare_model(module, task)
    return model, params, task, config
