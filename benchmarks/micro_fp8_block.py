"""Finds the largest GREEN fp8 query block for the GPT-2 bench score stage.

HISTORY: the r3 fp8 bench (KRON_BENCH_QUERY_STORAGE=float8_e4m3fn) OOMed in
the first train pass at the memory model's auto-sized 72-query block, and
this script's first run measured block 64 OOMing too. Those failures predate
the per-module token-serialization chain (score/pairwise.py: the `token`
threading landed in r3's FINAL snapshot, after the bench had already
reverted to bf16) — the scheduler was free to materialize many modules'
dense dequantized blocks concurrently. With the chain in place, compiler
memory_analysis (micro_fp8_memory.py, 2026-08-19) shows the fp8:72 superstep
TEMP at 5.11 GiB vs the green bf16:40's 5.02 GiB — i.e. the transient is
chunk-sized and ~query-count-independent, and utils/memory.py's quantized
term is now calibrated to that measurement. This script remains the on-chip
proof: it replicates the full bench's score-stage residents exactly (params,
bf16 precondition state, fp32 fidelity state, full-length device column
stores) and attempts ONE full train pass per candidate block size, reporting
pass/fail + peak HBM + wall time.

Usage: python benchmarks/micro_fp8_block.py [blocksize ...]   (default: 64 72 56)
Each block size must be a multiple of the query batch (8). Multiple sizes run
in SEPARATE subprocesses: after one RESOURCE_EXHAUSTED the TPU client is
poisoned and every later dispatch in the same process fails instantly
(measured 2026-08-19: blocks 72/56 "failed" in 0.0 s after 64's real OOM).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 2:  # parent: one subprocess per size
    for size in sys.argv[1:]:
        print(f"=== block {size} (fresh process) ===", file=sys.stderr, flush=True)
        subprocess.run([sys.executable, os.path.abspath(__file__), size])
    sys.exit(0)

from kronfluence_tpu.utils.platform import enable_persistent_cache

enable_persistent_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.arguments import ScoreArguments
from kronfluence_tpu.capture.engine import capture  # noqa: F401 (warm import)
from kronfluence_tpu.factor.covariance import discover_stage_specs
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.score.common import warm_precondition_state_cache
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.common.factor_arguments import (
    smart_low_precision_factor_arguments,
)
from kronfluence_tpu.utils.common.score_arguments import (
    smart_low_precision_score_arguments,
)
from kronfluence_tpu.utils.constants import (
    ACTIVATION_EIGENVALUES_NAME,
    ACTIVATION_EIGENVECTORS_NAME,
    GRADIENT_EIGENVALUES_NAME,
    GRADIENT_EIGENVECTORS_NAME,
    LAMBDA_MATRIX_NAME,
    NUM_LAMBDA_PROCESSED,
)
from kronfluence_tpu.utils.dataset import BatchLoader


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def hbm(label):
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)() or {}
    log(
        f"  HBM[{label}]: in_use {stats.get('bytes_in_use', 0) / 2**30:.2f} GiB, "
        f"peak {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB, "
        f"limit {stats.get('bytes_limit', 0) / 2**30:.2f} GiB"
    )


SIZES = [int(a) for a in sys.argv[1:2]] or [64]
SEQ = 512
QUERY_BATCH = 8
TRAIN_BATCH = 16
N_TRAIN = 4656

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

factor_args = smart_low_precision_factor_arguments(strategy="ekfac")
factor_args.use_empirical_fisher = True
score_args = smart_low_precision_score_arguments()
score_args.query_gradient_storage_dtype = os.environ.get(
    "KRON_BENCH_QUERY_STORAGE", "float8_e4m3fn")


def make_data(n, seed):
    r = np.random.default_rng(seed)
    dev = jax.device_put({
        "input_ids": r.integers(
            1, config.vocab_size, size=(n, SEQ)).astype(np.int32),
        "attention_mask": np.ones((n, SEQ), dtype=np.int32),
    })
    jax.block_until_ready(dev)
    return dev


query_data = make_data(max(SIZES), 5)
train_data = make_data(N_TRAIN, 6)
probe = {k: v[:QUERY_BATCH] for k, v in query_data.items()}
specs = discover_stage_specs(model, task, params, probe, model.tracked_names)

# Fabricated factors: identity eigenbases, unit lambdas — executables and
# memory behavior key on shapes/dtypes, not values (same trick as
# bench.py:concurrent_stage_warmup's fabricate()).
from kronfluence_tpu.utils.dtypes import resolve_dtype

act_dt = resolve_dtype(factor_args.activation_covariance_dtype)
grad_dt = resolve_dtype(factor_args.gradient_covariance_dtype)
lam_dt = resolve_dtype(factor_args.lambda_dtype)


@jax.jit
def fabricate():
    eig = {ACTIVATION_EIGENVECTORS_NAME: {}, ACTIVATION_EIGENVALUES_NAME: {},
           GRADIENT_EIGENVECTORS_NAME: {}, GRADIENT_EIGENVALUES_NAME: {}}
    lam = {LAMBDA_MATRIX_NAME: {}, NUM_LAMBDA_PROCESSED: {}}
    count = jnp.asarray(1024, jnp.int32)
    for name, spec in specs.items():
        da, dg = spec.activation_dim, spec.gradient_dim
        eig[ACTIVATION_EIGENVECTORS_NAME][name] = jnp.eye(da, dtype=act_dt)
        eig[ACTIVATION_EIGENVALUES_NAME][name] = jnp.ones((da,), act_dt)
        eig[GRADIENT_EIGENVECTORS_NAME][name] = jnp.eye(dg, dtype=grad_dt)
        eig[GRADIENT_EIGENVALUES_NAME][name] = jnp.ones((dg,), grad_dt)
        lam[LAMBDA_MATRIX_NAME][name] = jnp.ones((dg, da), lam_dt)
        lam[NUM_LAMBDA_PROCESSED][name] = count.reshape((1,))
    return eig, lam


eig, lam = fabricate()
jax.block_until_ready(eig)
factors = {**eig, **lam}

# Replicate the full bench's residents: bf16 state + the fp32 fidelity state
# (both live through the measured run — bench.py warms both then clears the
# raw factor dict).
spec_names = sorted(specs)
fp32_args = ScoreArguments(query_gradient_accumulation_steps=None)
jax.block_until_ready(warm_precondition_state_cache(
    model, factors, factor_args.strategy, score_args, spec_names))
jax.block_until_ready(warm_precondition_state_cache(
    model, factors, factor_args.strategy, fp32_args, spec_names))
factors.clear()
hbm("residents warmed")

for size in SIZES:
    acc = size // QUERY_BATCH
    score_args.query_gradient_accumulation_steps = acc
    q_loader = BatchLoader(query_data, QUERY_BATCH, indices=np.arange(size))
    t_loader = BatchLoader(train_data, TRAIN_BATCH)
    t0 = time.time()
    try:
        out = compute_pairwise_scores_with_loaders(
            model, params, task, q_loader, t_loader, factors, factor_args,
            score_args,
        )
        jax.block_until_ready(out)
        np.asarray(out["all_modules"][:1, :1])
        log(f"block {size} (8x{acc}): GREEN in {time.time() - t0:.1f}s "
            f"(warm pass = steady + compile on first size)")
        del out
    except Exception as exc:  # noqa: BLE001
        log(f"block {size} (8x{acc}): FAILED after {time.time() - t0:.1f}s: "
            f"{str(exc)[:200]}")
    hbm(f"after block {size}")
