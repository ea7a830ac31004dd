"""OpenWebText task: margin measurement + MLP-only tracking.

Reference analogue: /root/reference/examples/openwebtext/task.py:13-100
(LanguageModelingTask with margin-style compute_measurement and MLP-only
get_influence_tracked_modules -- the Llama-3-8B recipe tracks only
mlp.down_proj/up_proj/gate_proj).
"""

import jax
import jax.numpy as jnp
import optax

from kronfluence_tpu.task import Task


class MLPOnlyLMTask(Task):
    """Margin-style measurement + MLP-only tracked modules
    (reference: examples/openwebtext/task.py:53-100)."""

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
        # Margin of the target tokens vs the rest of the vocabulary.
        logits = model(batch["input_ids"], batch["attention_mask"])[:, :-1]
        logits = logits.astype(jnp.float32)
        labels = batch["input_ids"][:, 1:]
        mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
        correct = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        masked = jnp.where(
            jax.nn.one_hot(labels, logits.shape[-1], dtype=bool), -jnp.inf, logits
        )
        margins = correct - jax.nn.logsumexp(masked, axis=-1)
        return -jnp.sum(margins * mask)

    def get_influence_tracked_modules(self):
        names = []
        for i in range(self.num_layers):
            names += [f"h_{i}/mlp/c_fc", f"h_{i}/mlp/c_proj"]
        return names

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


class LlamaMLPOnlyTask(MLPOnlyLMTask):
    """Same margin measurement over Llama module paths: the reference's
    actual tracked set (examples/openwebtext/task.py:53-68 tracks
    mlp.{gate,up,down}_proj of every layer)."""

    def get_influence_tracked_modules(self):
        from kronfluence_tpu.models.llama import mlp_tracked_modules

        return mlp_tracked_modules(self.num_layers)


