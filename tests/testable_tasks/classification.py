"""Classification testable task: small CNN + synthetic images + summed CE loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.cnn import SmallCNN
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task


class ClassificationTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["x"])
        if not sample:
            labels = batch["y"]
        else:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        return jnp.sum(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )

    def compute_measurement(self, batch, model):
        # Margin measurement: correct-class logit minus logsumexp of the rest.
        logits = model(batch["x"])
        labels = batch["y"]
        bindex = jnp.arange(logits.shape[0])
        correct = logits[bindex, labels]
        cloned = logits.at[bindex, labels].set(-jnp.inf)
        margins = correct - jax.nn.logsumexp(cloned, axis=-1)
        return -jnp.sum(margins)


def make_classification_data(num: int, size: int = 8, channels: int = 3, classes: int = 5, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num, size, size, channels)).astype(np.float64)
    y = rng.integers(0, classes, size=(num,))
    return {"x": x, "y": y}


def make_cnn(size: int = 8, channels: int = 3, classes: int = 5, seed: int = 0, use_bias: bool = True):
    module = SmallCNN(num_classes=classes, channels=(4, 6), use_bias=use_bias)
    params = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, size, size, channels), jnp.float64)
    )["params"]
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.float64), params)
    task = ClassificationTask()
    model = prepare_model(module, task)
    return model, params, task
