"""ImageNet pipeline: data + ResNet-50 + classification task.

Reference analogue: /root/reference/examples/imagenet/pipeline.py
(torchvision ResNet-50 + ImageFolder loaders). No network egress here, so the
default is synthetic image batches; `real=True` loads a locally cached HF
`imagenet-1k` (or any image-classification dataset laid out the same way)
when present.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.resnet import ResNet9, resnet50
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task


class ClassificationTask(Task):
    """Summed CE + margin measurement (reference:
    examples/imagenet/pipeline.py ClassificationTask)."""

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


def synthetic_imagenet(num, size, classes=1000, seed=0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    return {
        "x": rng.normal(size=(num, size, size, 3)).astype(np.float32),
        "y": rng.integers(0, classes, size=num),
    }


def get_imagenet_dataset(split: str, num: int, size: int = 64, classes: int = 1000,
                         seed: int = 0, real: bool = False) -> Dict[str, np.ndarray]:
    """ImageNet as a column store; the real path center-crops a locally cached
    HF copy (reference pipeline.py uses torchvision transforms)."""
    if real:
        try:
            from datasets import load_dataset

            hf_split = "train" if split == "train" else "validation"
            ds = load_dataset("imagenet-1k", split=hf_split, streaming=False)
            ds = ds.select(range(min(num, len(ds))))
            xs = []
            for ex in ds:
                img = np.asarray(ex["image"].convert("RGB").resize((size, size)))
                xs.append(img.astype(np.float32) / 127.5 - 1.0)
            return {
                "x": np.stack(xs),
                "y": np.asarray(ds["label"], dtype=np.int64),
            }
        except Exception as exc:
            print(f"real imagenet unavailable ({exc}); using synthetic data")
    return synthetic_imagenet(num, size, classes, seed)


def construct_resnet(arch: str = "resnet50", num_classes: int = 1000,
                     image_size: int = 64, seed: int = 0):
    """Builds the ResNet classifier; returns (model, params, task).
    `resnet9` is the CI smoke-test size."""
    module = ResNet9(num_classes=num_classes) if arch == "resnet9" else resnet50(
        num_classes=num_classes
    )
    task = ClassificationTask()
    model = prepare_model(module, task)
    variables = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3))
    )
    return model, variables, task
