"""Secondary benchmark: CIFAR-scale ResNet-9 self-influence on one TPU chip.

Mirrors the reference's mislabeled-example-detection workload
(examples/cifar/README.md:129-151: fp32 on 1xA100-80GB, 50,000 train examples
— total 121.9 s: self-score 62.8 s, lambda 34.9 s, covariance 22.5 s,
eigh 0.91 s). Measures per-stage steady-state rates on synthetic CIFAR-shaped
data and projects to the 50k workload. This is the Conv2d-path counterpart of
the GPT-2 headline benchmark (`bench.py`); run manually — the driver bench is
`bench.py`.

Prints ONE JSON line with the self-influence throughput vs the A100 baseline.

Caveat on this dev environment: image batches are ~6 MB/step and the
tunneled host<->device link here is slow and highly variable (measured from
hundreds of MB/s down to <1 MB/s across sessions), so CIFAR-side rates are
often input-bound and noisy — unlike `bench.py`, whose token batches are
~32 KB. On a real TPU host (local DMA at GB/s) input feeding is a non-issue.
"""

import json
import os
import sys
import time

import numpy as np

REF_TRAIN = 50_000
REF_TOTAL_S = 121.9
REF_SELF_S = 62.8
REF_LAMBDA_S = 34.9
REF_COV_S = 22.5
REF_EIGH_S = 0.91

N_COV = 6144
N_LAMBDA = 4096
N_SELF = 4096
# Per-stage batch sizes: covariance/lambda amortize per-step dispatch with
# large batches; the self stage materializes (batch, o, i) preconditioned
# per-sample gradients per module, so it runs smaller.
_envb = lambda name, default: int(os.environ.get(f"KRON_BENCH_CIFAR_{name}", default))
COV_BATCH = _envb("COV_BATCH", 512)
LAMBDA_BATCH = _envb("LAMBDA_BATCH", 512)
SELF_BATCH = _envb("SELF_BATCH", 128)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import optax

    from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
    from kronfluence_tpu.factor.eigen import (
        fit_lambda_matrices_with_loader,
        perform_eigendecomposition,
    )
    from kronfluence_tpu.models.resnet import ResNet9
    from kronfluence_tpu.prepare import prepare_model
    from kronfluence_tpu.score.self_scores import compute_self_scores_with_loaders
    from kronfluence_tpu.task import Task
    from kronfluence_tpu.utils.common.factor_arguments import (
        smart_low_precision_factor_arguments,
    )
    from kronfluence_tpu.utils.common.score_arguments import (
        smart_low_precision_score_arguments,
    )
    from kronfluence_tpu.utils.dataset import BatchLoader

    log(f"devices: {jax.devices()}")
    module = ResNet9(num_classes=10, dtype=jnp.bfloat16)

    class ClassificationTask(Task):
        def compute_train_loss(self, batch, model, sample=False, rng=None):
            logits = model(batch["x"]).astype(jnp.float32)
            if sample:
                labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
            else:
                labels = batch["y"]
            return jnp.sum(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )

        def compute_measurement(self, batch, model):
            return self.compute_train_loss(batch, model)

    task = ClassificationTask()
    model = prepare_model(module, task)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )()

    def make_data(n, seed):
        # Pre-uploaded to device (see bench.py make_data): steady-state rates
        # measure the pipeline, not the dev tunnel's host->device link.
        r = np.random.default_rng(seed)
        host = {
            "x": r.normal(size=(n, 32, 32, 3)).astype(np.float32),
            "y": r.integers(0, 10, size=(n,)).astype(np.int32),
        }
        dev = jax.device_put(host)
        for v in dev.values():
            np.asarray(v[:1])
        return dev

    factor_args = smart_low_precision_factor_arguments(strategy="ekfac")
    factor_args.use_empirical_fisher = True
    factor_args.eigendecomposition_dtype = "float32"
    score_args = smart_low_precision_score_arguments()

    def force(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    stages = {}

    t0 = time.time()
    force(fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(make_data(2 * COV_BATCH, 11), COV_BATCH), factor_args))
    log(f"covariance warmup (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(make_data(N_COV, 1), COV_BATCH), factor_args)
    force(cov)
    stages["cov"] = time.time() - t0
    cov_rate = N_COV / stages["cov"]
    log(f"covariance steady: {cov_rate:.0f} ex/s")

    t0 = time.time()
    eigen = perform_eigendecomposition(cov, factor_args)
    force(eigen)
    log(f"eigendecomposition warmup (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    eigen = perform_eigendecomposition(cov, factor_args)
    force(eigen)
    stages["eigh"] = time.time() - t0
    log(f"eigendecomposition steady: {stages['eigh']:.1f}s")

    t0 = time.time()
    force(fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(make_data(2 * LAMBDA_BATCH, 12), LAMBDA_BATCH),
        factor_args, eigen_factors=eigen))
    log(f"lambda warmup (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(make_data(N_LAMBDA, 3), LAMBDA_BATCH),
        factor_args, eigen_factors=eigen)
    force(lam)
    stages["lambda"] = time.time() - t0
    lam_rate = N_LAMBDA / stages["lambda"]
    log(f"lambda steady: {lam_rate:.0f} ex/s")

    factors = {**eigen, **lam}
    del cov, eigen, lam

    t0 = time.time()
    compute_self_scores_with_loaders(
        model, params, task, BatchLoader(make_data(2 * SELF_BATCH, 13), SELF_BATCH),
        factors, factor_args, score_args)
    log(f"self-score warmup (compile): {time.time() - t0:.1f}s")
    # Precondition states are now cached (anchored on `factors`); free the
    # raw device factor arrays (see bench.py).
    factors.clear()
    t0 = time.time()
    compute_self_scores_with_loaders(
        model, params, task, BatchLoader(make_data(N_SELF, 6), SELF_BATCH),
        factors, factor_args, score_args)
    stages["self"] = time.time() - t0
    self_rate = N_SELF / stages["self"]
    log(f"self-score steady: {self_rate:.0f} ex/s")

    proj = {
        "cov": REF_TRAIN / cov_rate,
        "eigh": stages["eigh"],
        "lambda": REF_TRAIN / lam_rate,
        "self": REF_TRAIN / self_rate,
    }
    ref = {"cov": REF_COV_S, "eigh": REF_EIGH_S, "lambda": REF_LAMBDA_S, "self": REF_SELF_S}
    total = sum(proj.values())
    log("")
    log(f"{'stage':<10}{'ours (s)':>10}{'A100 fp32 (s)':>15}{'speedup':>9}")
    for k in ("cov", "eigh", "lambda", "self"):
        log(f"{k:<10}{proj[k]:>10.1f}{ref[k]:>15.1f}{ref[k] / proj[k]:>8.1f}x")
    log(f"{'total':<10}{total:>10.1f}{REF_TOTAL_S:>15.1f}{REF_TOTAL_S / total:>8.1f}x")

    print(json.dumps({
        "metric": "cifar_resnet9_ekfac_self_influence_throughput",
        "value": round(self_rate, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(self_rate / (REF_TRAIN / REF_SELF_S), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
