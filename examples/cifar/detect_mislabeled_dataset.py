"""CIFAR-style mislabeled-example detection via self-influence scores
(reference: examples/cifar/detect_mislabeled_dataset.py).

Trains ResNet-9 on synthetic images with 10% deliberately corrupted labels,
computes EKFAC self-influence, and reports what fraction of the corrupted
labels appear in the top-scoring examples — high self-influence flags
mislabeled data.

    python examples/cifar/detect_mislabeled_dataset.py --num_train 1024
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.models.resnet import ResNet9
from kronfluence_tpu.task import Task

from examples.common import train_model


class ClassificationTask(Task):
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


def synthetic_cifar(num: int, corrupt_frac: float = 0.1, seed: int = 0):
    rng = np.random.default_rng(seed)
    # Class-dependent image statistics so the task is learnable.
    labels = rng.integers(0, 10, size=num)
    means = rng.normal(size=(10, 1, 1, 3))
    x = 0.5 * rng.normal(size=(num, 32, 32, 3)) + means[labels]
    num_corrupt = int(num * corrupt_frac)
    corrupt_idx = rng.choice(num, num_corrupt, replace=False)
    y = labels.copy()
    y[corrupt_idx] = (y[corrupt_idx] + rng.integers(1, 10, num_corrupt)) % 10
    return {"x": x.astype(np.float32), "y": y}, corrupt_idx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_train", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--output_dir", default="./influence_results/cifar")
    args = parser.parse_args()

    train_data, corrupt_idx = synthetic_cifar(args.num_train)

    module = ResNet9(num_classes=10)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    task = ClassificationTask()
    model_mutable = prepare_model(module, task)

    # Train (with BatchNorm stats updates handled via mutable collections).
    import flax.linen as nn

    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    tx = optax.adamw(1e-3, weight_decay=1e-4)
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

    rng = np.random.default_rng(0)
    num = len(train_data["y"])
    for epoch in range(args.epochs):
        order = rng.permutation(num)
        losses = []
        for start in range(0, num - args.batch_size + 1, args.batch_size):
            idx = order[start : start + args.batch_size]
            batch = {k: jnp.asarray(v[idx]) for k, v in train_data.items()}
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    analysis_params = {"params": params, "batch_stats": batch_stats}
    analyzer = Analyzer("cifar", model_mutable, task, params=analysis_params,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.batch_size,
        factor_args=FactorArguments(strategy="ekfac"),
    )
    analyzer.compute_self_scores(
        "self", "ekfac", train_data, per_device_train_batch_size=args.batch_size,
        score_args=ScoreArguments(),
    )
    scores = analyzer.load_self_scores("self")["all_modules"]

    order = np.argsort(scores)[::-1]
    corrupt = set(map(int, corrupt_idx))
    for frac in (0.1, 0.2):
        top = set(map(int, order[: int(len(order) * frac)]))
        recall = len(top & corrupt) / len(corrupt)
        print(f"top-{int(frac*100)}% self-influence captures "
              f"{100*recall:.1f}% of mislabeled examples")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
