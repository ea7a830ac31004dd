"""Shared example utilities: tiny optax training loop + synthetic data.

The reference examples download real datasets (UCI, CIFAR, GLUE, ...); this
environment has no network egress, so every example runs on synthetic data by
default and accepts `--real` to use locally cached HF datasets when present.
The pipeline structure (train.py-style fit, analyze.py-style scoring) mirrors
the reference examples/ layout.
"""

import time
from typing import Any, Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def train_model(
    loss_fn: Callable[[Any, Dict[str, jax.Array], jax.Array], jax.Array],
    params: Any,
    data: Dict[str, np.ndarray],
    batch_size: int = 32,
    num_epochs: int = 5,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    seed: int = 0,
) -> Any:
    """Minimal AdamW training loop over an in-memory column-store dataset."""
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)
    num = len(next(iter(data.values())))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for epoch in range(num_epochs):
        order = rng.permutation(num)
        losses = []
        for start in range(0, num - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, batch, sub)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} ({time.time() - t0:.1f}s)")
    return params


def load_params_checkpoint(path, template_params: Any) -> Any:
    """Loads a flat safetensors checkpoint (saved by the train.py scripts via
    `_flatten_params` + `save_file`) back into the model's nested param tree."""
    from kronfluence_tpu.utils.save import load_file

    flat = load_file(path)

    def rebuild(tree, prefix):
        if isinstance(tree, dict):
            return {
                key: rebuild(value, f"{prefix}/{key}" if prefix else str(key))
                for key, value in tree.items()
            }
        return jnp.asarray(flat[prefix])

    return rebuild(template_params, "")


def print_top_influences(scores: np.ndarray, k: int = 5) -> None:
    """Prints the most positively/negatively influential train indices per query."""
    for q in range(min(3, scores.shape[0])):
        row = scores[q]
        top = np.argsort(row)[::-1][:k]
        bottom = np.argsort(row)[:k]
        print(f"query {q}: top {list(top)} (scores {np.round(row[top], 3)}), "
              f"bottom {list(bottom)}")
