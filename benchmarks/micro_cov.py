"""Decomposes the covariance stage's per-batch cost on the GPT-2 bench workload.

Round-3 VERDICT weak #3: covariance runs at 187.5 ex/s against a round-1
target of 250. This script separates the candidate costs the same way
micro_lambda.py does for the lambda stage:

  capture   — forward + backward + (a, dy) capture ONLY (stub fp32
              sum-of-squares reduction). The floor: covariance can never be
              faster than this. (Same protocol as micro_lambda's 305.7 ex/s
              floor measurement.)
  cov       — the real covariance stage, scanned superstep loop
              (production default for device-resident stores).
  cov_nosyrk— same with KRON_SYRK=0 (XLA full gram instead of the Pallas
              triangle-tile syrk) — quantifies the syrk win in-stage.

Roofline context (see benchmarks/README.md): the gram updates are
~167 GFLOP/example at GPT-2 dims with triangle-tile syrk (~333 full), on top
of a ~290 GFLOP/example fwd+bwd. 250 ex/s would need ~58% sustained MFU
across the mixed capture+gram program.

Usage: python benchmarks/micro_cov.py [capture|cov|cov_nosyrk|all]
                                      [--batch N]... [--n N]
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
                    choices=["capture", "cov", "cov_nosyrk", "all"])
    ap.add_argument("--batch", type=int, action="append", default=None)
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    batches = args.batch or [16]
    variants = (["capture", "cov", "cov_nosyrk"] if args.variant == "all"
                else [args.variant])

    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kronfluence_tpu.capture.engine import capture
    from kronfluence_tpu.factor.covariance import (
        fit_covariance_matrices_with_loader,
        train_loss_forward,
    )
    from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
    from kronfluence_tpu.prepare import prepare_model
    from kronfluence_tpu.task import Task
    from kronfluence_tpu.utils.common.factor_arguments import (
        smart_low_precision_factor_arguments,
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
        jax.block_until_ready(tree)
        leaf = jax.tree_util.tree_leaves(tree)[0]
        float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    data = make_data(args.n, 1)

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
        force(outs[-1])
        dt = time.time() - t0
        log(f"  capture B={B}: {nb * B / dt:.1f} ex/s ({dt:.2f}s / {nb} batches)")

    def run_stage(B, syrk):
        os.environ["KRON_SYRK"] = "1" if syrk else "0"
        # KRON_SYRK is read at ops/covariance.py import; reset the module flag
        # directly so one process can A/B both settings.
        import kronfluence_tpu.ops.covariance as covmod

        covmod._SYRK_ENABLED = syrk
        # The stage step is cached per signature which does NOT include the
        # syrk flag (it's module state, not an argument); drop the cache so
        # the A/B rebuilds the program.
        model.__dict__.pop("_step_cache", None)
        label = "cov" if syrk else "cov_nosyrk"
        loader = BatchLoader(data, B, indices=np.arange(2 * B))
        t0 = time.time()
        force(fit_covariance_matrices_with_loader(
            model, params, task, loader, factor_args))
        log(f"  {label} B={B}: warmup {time.time() - t0:.1f}s")
        t0 = time.time()
        force(fit_covariance_matrices_with_loader(
            model, params, task, BatchLoader(data, B), factor_args))
        dt = time.time() - t0
        log(f"  {label} B={B}: {args.n / dt:.1f} ex/s ({dt:.2f}s)")

    for B in batches:
        log(f"batch {B}:")
        for v in variants:
            if v == "capture":
                run_capture(B)
            elif v == "cov":
                run_stage(B, syrk=True)
            elif v == "cov_nosyrk":
                run_stage(B, syrk=False)


if __name__ == "__main__":
    main()
