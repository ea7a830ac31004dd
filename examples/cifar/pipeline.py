"""CIFAR-10 pipeline: data + ResNet-9 + classification task.

Reference analogue: /root/reference/examples/cifar/pipeline.py
(get_cifar10_dataset with torchvision transforms, construct_resnet9). This
environment has no network egress, so the default data path is synthetic
images with class-dependent statistics (learnable, same shapes); a locally
cached CIFAR-10 copy is used when `real=True` and available.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.resnet import ResNet9
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task


class ClassificationTask(Task):
    """Summed CE train loss + margin measurement (reference:
    examples/cifar/pipeline.py:78-113 CustomClassificationTask)."""

    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["x"])
        if sample:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        else:
            labels = batch["y"]
        return jnp.sum(optax.softmax_cross_entropy_with_integer_labels(logits, labels))

    def compute_measurement(self, batch, model):
        logits = model(batch["x"])
        labels = batch["y"]
        bindex = jnp.arange(logits.shape[0])
        correct = logits[bindex, labels]
        cloned = logits.at[bindex, labels].set(-jnp.inf)
        return -jnp.sum(correct - jax.nn.logsumexp(cloned, axis=-1))


def synthetic_cifar(
    num: int, corrupt_frac: float = 0.0, seed: int = 0
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Learnable synthetic CIFAR-shaped data; optionally corrupts a fraction
    of labels (for the mislabel-detection analysis) and returns their indices."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, size=num)
    means = rng.normal(size=(10, 1, 1, 3))
    x = 0.5 * rng.normal(size=(num, 32, 32, 3)) + means[labels]
    y = labels.copy()
    corrupt_idx = np.array([], dtype=np.int64)
    if corrupt_frac > 0:
        num_corrupt = int(num * corrupt_frac)
        corrupt_idx = rng.choice(num, num_corrupt, replace=False)
        y[corrupt_idx] = (y[corrupt_idx] + rng.integers(1, 10, num_corrupt)) % 10
    return {"x": x.astype(np.float32), "y": y}, corrupt_idx


def get_cifar10_dataset(
    split: str, num: Optional[int] = None, corrupt_frac: float = 0.0,
    seed: int = 0, real: bool = False,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """CIFAR-10 as a column store {x: (N,32,32,3) float32, y: (N,) int}.

    `real=True` loads a locally cached HF `cifar10` copy (normalized with the
    reference's per-channel stats, pipeline.py:24-27); otherwise synthetic.
    """
    if real:
        try:
            from datasets import load_dataset

            ds = load_dataset("cifar10", split="train" if split == "train" else "test")
            if num is not None:
                ds = ds.select(range(num))
            x = np.stack([np.asarray(img, dtype=np.float32) / 255.0 for img in ds["img"]])
            mean = np.array([0.4914, 0.4822, 0.4465], dtype=np.float32)
            std = np.array([0.247, 0.243, 0.261], dtype=np.float32)
            x = (x - mean) / std
            y = np.asarray(ds["label"], dtype=np.int64)
            corrupt_idx = np.array([], dtype=np.int64)
            if corrupt_frac > 0:
                rng = np.random.default_rng(seed)
                num_corrupt = int(len(y) * corrupt_frac)
                corrupt_idx = rng.choice(len(y), num_corrupt, replace=False)
                y = y.copy()
                y[corrupt_idx] = (y[corrupt_idx] + rng.integers(1, 10, num_corrupt)) % 10
            return {"x": x, "y": y}, corrupt_idx
        except Exception as exc:  # no cache in this environment
            print(f"real CIFAR-10 unavailable ({exc}); using synthetic data")
    return synthetic_cifar(num or 1024, corrupt_frac, seed)


def construct_resnet9(num_classes: int = 10, seed: int = 0):
    """ResNet-9 (reference: examples/cifar/pipeline.py:30-76 Mul/Flatten/
    Residual stack) + init variables; returns (module, variables)."""
    module = ResNet9(num_classes=num_classes)
    variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
    return module, variables


def train_resnet9(
    train_data: Dict[str, np.ndarray],
    epochs: int = 10,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    seed: int = 0,
    verbose: bool = True,
):
    """AdamW training with BatchNorm statistics updates; returns analysis-ready
    variables {params, batch_stats} plus the prepared model and task."""
    module, variables = construct_resnet9(seed=seed)
    task = ClassificationTask()
    model = prepare_model(module, task)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            logits, mutated = module.apply(
                {"params": p, "batch_stats": batch_stats}, batch["x"], train=True,
                mutable=["batch_stats"],
            )
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, batch["y"])
            )
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    rng = np.random.default_rng(seed)
    num = len(train_data["y"])
    for epoch in range(epochs):
        order = rng.permutation(num)
        losses = []
        for start in range(0, num - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            batch = {k: jnp.asarray(v[idx]) for k, v in train_data.items()}
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch
            )
            losses.append(float(loss))
        if verbose:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    return {"params": params, "batch_stats": batch_stats}, model, task
