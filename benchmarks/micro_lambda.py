"""Decomposes the lambda stage's per-batch cost on the GPT-2 bench workload.

The lambda stage (factor/eigen.py:fit_lambda_matrices_with_loader) regressed
to ~47 ex/s in the first full-scale bench (r01 quick-mode measured ~98 ex/s).
This script separates the candidate costs so the fix targets the right one:

  capture   — forward + backward + (a, dy) capture ONLY (a cheap fp32
              sum-of-squares over every captured tensor stands in for the
              lambda math so nothing is dead-code-eliminated). This is the
              floor: lambda can never be faster than this.
  perbatch  — the real lambda stage through the per-batch jitted-step loop
              (KF_SCAN_DISABLE=1 path), device-resident data.
  scan      — the real lambda stage through the scanned superstep loop
              (the production default for device-resident stores).

Eigenvectors are FABRICATED (random normal, bf16): lambda throughput does not
depend on their values, so the covariance/eigh stages are skipped entirely.

Usage: python benchmarks/micro_lambda.py [capture|perbatch|scan|all]
                                         [--batch N]... [--n N]
Each --batch adds a batch size to the sweep (default: 32). --n sets the
steady-state example count (default 512). Timings to stderr.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", nargs="?", default="all",
                    choices=["capture", "perbatch", "scan", "all"])
    ap.add_argument("--batch", type=int, action="append", default=None)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--ballast", type=int, default=0,
                    help="MB of dummy device-resident allocation held across "
                         "the run (replicates the full bench's resident "
                         "covariance factors to test HBM-pressure sensitivity)")
    args = ap.parse_args()
    batches = args.batch or [32]
    variants = (["capture", "perbatch", "scan"] if args.variant == "all"
                else [args.variant])

    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kronfluence_tpu.arguments import FactorArguments
    from kronfluence_tpu.capture.engine import capture
    from kronfluence_tpu.factor.covariance import (
        discover_stage_specs,
        train_loss_forward,
    )
    from kronfluence_tpu.factor.eigen import fit_lambda_matrices_with_loader
    from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
    from kronfluence_tpu.prepare import prepare_model
    from kronfluence_tpu.task import Task
    from kronfluence_tpu.utils.common.factor_arguments import (
        smart_low_precision_factor_arguments,
    )
    from kronfluence_tpu.utils.constants import (
        ACTIVATION_EIGENVALUES_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
        GRADIENT_EIGENVALUES_NAME,
        GRADIENT_EIGENVECTORS_NAME,
    )
    from kronfluence_tpu.utils.dataset import BatchLoader

    log(f"devices: {jax.devices()}")
    SEQ = 512
    config = TransformerConfig(
        vocab_size=50257, max_seq_len=SEQ, num_layers=12, num_heads=12,
        d_model=768, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    module = TransformerLM(config)

    class BenchTask(Task):
        def compute_train_loss(self, batch, model, sample=False, rng=None):
            logits = model(batch["input_ids"], batch["attention_mask"])[:, :-1]
            mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
            labels = batch["input_ids"][:, 1:]
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels)
            return jnp.sum(losses * mask)

        def compute_measurement(self, batch, model):
            return self.compute_train_loss(batch, model)

        def get_influence_tracked_modules(self):
            names = []
            for i in range(config.num_layers):
                names += [f"h_{i}/attn/c_attn", f"h_{i}/attn/c_proj",
                          f"h_{i}/mlp/c_fc", f"h_{i}/mlp/c_proj"]
            return names

        def get_attention_mask(self, batch):
            return batch["attention_mask"]

    task = BenchTask()
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, SEQ), jnp.int32))["params"])()
    jax.block_until_ready(params)
    model = prepare_model(module, task)

    def make_data(n, seed):
        r = np.random.default_rng(seed)
        dev = jax.device_put({
            "input_ids": r.integers(
                1, config.vocab_size, size=(n, SEQ)).astype(np.int32),
            "attention_mask": np.ones((n, SEQ), dtype=np.int32),
        })
        jax.block_until_ready(dev)
        return dev

    factor_args = smart_low_precision_factor_arguments(strategy="ekfac")
    factor_args.use_empirical_fisher = True

    def force(tree):
        """Forces completion through a device->host scalar fetch:
        block_until_ready alone can return early on tunneled backends (same
        protocol as bench.py:force)."""
        jax.block_until_ready(tree)
        leaf = jax.tree_util.tree_leaves(tree)[0]
        float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    ballast = None
    if args.ballast:
        ballast = jax.device_put(
            jnp.zeros((args.ballast, 1024, 256), jnp.float32))  # MB-sized rows
        jax.block_until_ready(ballast)
        log(f"ballast: {args.ballast} MB resident")

    data = make_data(args.n, 1)
    probe = {k: v[: batches[0]] for k, v in data.items()}
    specs = discover_stage_specs(model, task, params, probe, model.tracked_names)

    # Fabricated eigenbases: values are irrelevant to throughput.
    key = jax.random.PRNGKey(7)
    eigen = {ACTIVATION_EIGENVECTORS_NAME: {}, ACTIVATION_EIGENVALUES_NAME: {},
             GRADIENT_EIGENVECTORS_NAME: {}, GRADIENT_EIGENVALUES_NAME: {}}
    for name, spec in specs.items():
        ka, kg, key = jax.random.split(key, 3)
        da, dg = spec.activation_dim, spec.gradient_dim
        eigen[ACTIVATION_EIGENVECTORS_NAME][name] = jax.random.normal(
            ka, (da, da), jnp.bfloat16) / np.sqrt(da)
        eigen[GRADIENT_EIGENVECTORS_NAME][name] = jax.random.normal(
            kg, (dg, dg), jnp.bfloat16) / np.sqrt(dg)
        eigen[ACTIVATION_EIGENVALUES_NAME][name] = jnp.ones((da,), jnp.bfloat16)
        eigen[GRADIENT_EIGENVALUES_NAME][name] = jnp.ones((dg,), jnp.bfloat16)
    jax.block_until_ready(eigen)

    def run_capture(B):
        tracked = list(model.tracked_names)

        @jax.jit
        def step(params, batch, valid, rng):
            forward = train_loss_forward(
                model, task, params, batch, sample=False, rng=rng)
            _, caps = capture(forward, tracked)
            tot = jnp.zeros((), jnp.float32)
            for cap in caps.values():
                for a in cap.activations:
                    tot += jnp.sum(jnp.square(a.astype(jnp.float32)))
                for g in cap.output_gradients:
                    tot += jnp.sum(jnp.square(g.astype(jnp.float32)))
            return tot

        rng = jax.random.PRNGKey(0)
        valid = jnp.ones((B,), jnp.float32)
        batch0 = {k: v[:B] for k, v in data.items()}
        t0 = time.time()
        force(step(params, batch0, valid, rng))
        log(f"  capture B={B}: compile {time.time() - t0:.1f}s")
        nb = args.n // B
        t0 = time.time()
        outs = [
            step(params, {k: v[i * B:(i + 1) * B] for k, v in data.items()},
                 valid, rng)
            for i in range(nb)
        ]
        # The device stream is serial: forcing the last output through a host
        # fetch awaits every prior step too.
        force(outs[-1])
        dt = time.time() - t0
        log(f"  capture B={B}: {nb * B / dt:.1f} ex/s ({dt:.2f}s / {nb} batches)")

    def run_stage(B, scanned):
        os.environ["KF_SCAN_DISABLE"] = "0" if scanned else "1"
        label = "scan" if scanned else "perbatch"
        loader = BatchLoader(data, B, indices=np.arange(2 * B))
        t0 = time.time()
        force(fit_lambda_matrices_with_loader(
            model, params, task, loader, factor_args, eigen_factors=eigen))
        log(f"  {label} B={B}: warmup {time.time() - t0:.1f}s")
        t0 = time.time()
        force(fit_lambda_matrices_with_loader(
            model, params, task, BatchLoader(data, B), factor_args,
            eigen_factors=eigen))
        dt = time.time() - t0
        log(f"  {label} B={B}: {args.n / dt:.1f} ex/s ({dt:.2f}s)")

    for B in batches:
        log(f"batch {B}:")
        for v in variants:
            if v == "capture":
                run_capture(B)
            elif v == "perbatch":
                run_stage(B, scanned=False)
            elif v == "scan":
                run_stage(B, scanned=True)


if __name__ == "__main__":
    main()
