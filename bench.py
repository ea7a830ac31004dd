"""Benchmark: GPT-2-small EKFAC influence pipeline on one TPU chip.

Mirrors the reference's headline workload (examples/wikitext: GPT-2, seq 512,
48 tracked modules = attn.c_attn/c_proj + mlp.c_fc/c_proj x 12 layers,
measurement == train loss) on synthetic tokens, measures per-stage
steady-state rates, and projects to the full reference workload
(4656 train examples x 481 queries) for comparison against the published
A100 fp32 numbers (BASELINE.md: total 2357 s; score 1888 s; lambda 275 s;
cov 180 s; eigh 7.8 s).

Measurement protocol: each stage is run once for warmup (XLA compilation —
cached persistently in .jax_cache, so reruns skip it; the reference's numbers
likewise exclude cuSOLVER/cuBLAS library initialization) and then timed in
steady state, forcing completion through a device->host scalar fetch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
metric is pairwise-score throughput (pairs/sec/chip) and vs_baseline is the
ratio to the A100 fp32 reference rate on the same (model, seq, modules) math.
"""

import json
import os
import sys
import time

import numpy as np

# Wall-clock anchor for the optional-phase budget (KRON_BENCH_BUDGET_S is
# measured from process start, approximating the driver's external timeout).
T_START = time.time()

# Reference workload constants (examples/wikitext/README.md).
REF_TRAIN = 4656
REF_QUERY = 481
REF_TOTAL_S = 2357.0
REF_SCORE_S = 1888.0
REF_LAMBDA_S = 275.0
REF_COV_S = 180.0
REF_EIGH_S = 7.8
REF_PAIRS_PER_S = REF_QUERY * REF_TRAIN / REF_SCORE_S  # ~1186 pairs/s

# Bench sizes. Default mode is FULL: the real reference workload (4656 train
# x 481 queries) executed end-to-end and measured, not extrapolated
# (round-1 VERDICT #3). KRON_BENCH_QUICK=1 switches to the small
# steady-state-rate mode (projected totals) for fast tuning iterations.
# KRON_BENCH_* env vars override the batch knobs for tuning experiments.
_env = lambda name, default: int(os.environ.get(f"KRON_BENCH_{name}", default))
QUICK = bool(_env("QUICK", 0))
N_COV = _env("N_COV", 512 if QUICK else 4656)
N_LAMBDA = _env("N_LAMBDA", 256 if QUICK else 4656)
N_QUERY = _env("N_QUERY", 40 if QUICK else 481)
N_TRAIN = _env("N_TRAIN", 1024 if QUICK else 4656)
SEQ = _env("SEQ", 512)
# Flagship model form. Both were measured on the v5e (2026-08-17):
#   unrolled: cov compile 262 s (round 1) / 153 s cached-load, steady 121 ex/s
#   scan:     cov compile 681 s, steady 107.6 ex/s, lambda OOM at batch 32
#             (backward-of-scan keeps every layer's attention probs live;
#             scan+remat fixes memory at ~+25% recompute)
# XLA's while-loop compilation path is SLOWER than the unrolled 48-module HLO
# here, and on this tunneled backend warmup is dominated by uploading cached
# executables either way — so the unrolled form stays the production default,
# and scan(+remat) remains the supported option for depths where unrolled
# tracing is infeasible. Factors are identical across all three forms
# (tests/test_transformer.py, tests/test_scan_remat.py).
MODEL_FORM = os.environ.get("KRON_BENCH_MODEL", "unrolled")
SCAN_REMAT = bool(_env("SCAN_REMAT", 0))
COV_BATCH = _env("COV_BATCH", 16)   # 32 measured slightly worse (125 vs 131 ex/s)
LAMBDA_BATCH = _env("LAMBDA_BATCH", 32)  # 32 measured ~6% faster than 16
# Query blocks: small per-step batches accumulated into one resident block —
# big blocks amortize the train-side backward, small steps bound the peak HBM
# of query-gradient capture (the chunked-block design in score/pairwise.py).
# QUERY_ACC=0 (default) sizes the block from the analytic memory model
# (utils/memory.py:max_queries_per_block): the r02 full bench OOMed on a
# hand-picked 56-query block, the exact failure the model now prevents.
QUERY_BATCH = _env("QUERY_BATCH", 8)
QUERY_ACC = _env("QUERY_ACC", 0)  # accumulation steps; 0 = auto from memory model
TRAIN_BATCH = _env("TRAIN_BATCH", 16)
N_QUERY = max(N_QUERY, QUERY_BATCH * max(QUERY_ACC, 1))
# KRON_BENCH_FIDELITY: after the timed low-precision run, score the query
# set again in fp32 and report Pearson/Spearman correlation — apples-to-apples
# with the reference's published 0.96 over 481 queries
# (examples/wikitext/README.md:97). The timed run's own scores are the
# low-precision side, so fidelity adds exactly one fp32 scoring pass.
# Defaults ON for the FULL driver run; QUICK tuning runs skip.
#
# STRUCTURE (round-4 postmortem): the primary JSON metric line is printed
# IMMEDIATELY after the timed pairwise run — fidelity is an optional phase
# that can only ADD a second, enriched JSON line, never forfeit the metric.
# The fp32 pass is wall-clock-budgeted against KRON_BENCH_BUDGET_S (time
# left before the driver's timeout): full width when it fits, a one-block
# certificate (labeled as such) when short, skipped when there is no room.
FIDELITY = bool(_env("FIDELITY", 0 if QUICK else 1))
BUDGET_S = float(os.environ.get("KRON_BENCH_BUDGET_S", 1080))
# KRON_BENCH_CONCURRENT_WARMUP: pre-warm all four stages' executables on
# threads before any stage is timed. Stage programs are independent; eigh/
# lambda/score warm against FABRICATED factor inputs with exactly the
# production avals (executables key on shapes/dtypes, not values), so no
# stage's compile waits for an upstream stage's real output. The sequential
# inline warmups still run and are reported — after the concurrent block they
# are small residuals (one real execution each). Cold total then counts
# concurrent wall + residuals, honestly comparable to the sequential mode.
CONCURRENT_WARMUP = bool(_env("CONCURRENT_WARMUP", 0))
# KRON_BENCH_ONLY=cov: stop after the covariance stage with a cov-only JSON
# line — targeted stage A/Bs (batch size, syrk mode) at the PRODUCTION
# dataset size without paying the remaining ~5 min of e2e per data point.
ONLY = os.environ.get("KRON_BENCH_ONLY", "")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _require_reachable_devices(timeout_s: float = 600.0):
    """Fails fast (with a diagnosable JSON line) when the accelerator is
    unreachable. On this environment's tunneled TPU a dead tunnel makes
    jax.devices() hang FOREVER — a clear error beats a silent wedge of the
    whole bench run."""
    import threading

    out = {}

    def probe():
        import jax

        out["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(
            json.dumps(
                {
                    "metric": "gpt2_wikitext_ekfac_pairwise_throughput",
                    "value": None,
                    "unit": "pairs/sec/chip",
                    "vs_baseline": None,
                    "error": f"accelerator unreachable: jax.devices() did not "
                    f"return within {timeout_s:.0f}s (TPU tunnel down?)",
                }
            ),
            flush=True,
        )
        os._exit(3)
    return out["devices"]


# NOTE on FIDELITY residents: the bf16 and fp32 recipes share one
# precondition-state cache entry (same strategy/damping/precondition_dtype ->
# same precondition_cache_key, verified), and the fp32 comparison block is
# built only AFTER the timed bf16 stage. FIDELITY therefore adds no resident
# to the timed stage and the block sizer needs no reserve for it.


def concurrent_stage_warmup(
    model, params, task, factor_args, score_args, make_data, force, warmups, log
):
    """Pre-warms all four stages' executables on threads (cold-start path).

    The four stage programs are independent; sequentially their compiles (or
    persistent-cache loads) dominate a cold run. eigh/lambda/score warm
    against FABRICATED factor inputs that carry exactly the avals the real
    drivers produce — executables key on shapes/dtypes, not values — so no
    stage's compile waits for an upstream stage's real output. Warmup stores
    are fresh arrays of the SAME lengths as the measured stores: the scanned
    stage loop keys its superstep executable on the canonical padded length
    derived from (dataset length, batch size) (utils/scan_loop.py).
    """
    import copy
    import threading

    import jax
    import jax.numpy as jnp

    from kronfluence_tpu.factor.covariance import (
        discover_stage_specs,
        fit_covariance_matrices_with_loader,
    )
    from kronfluence_tpu.factor.eigen import (
        fit_lambda_matrices_with_loader,
        perform_eigendecomposition,
    )
    from kronfluence_tpu.score.pairwise import (
        compute_pairwise_scores_with_loaders,
        resolve_query_accumulation,
    )
    from kronfluence_tpu.utils.constants import (
        ACTIVATION_COVARIANCE_MATRIX_NAME,
        ACTIVATION_EIGENVALUES_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
        GRADIENT_COVARIANCE_MATRIX_NAME,
        GRADIENT_EIGENVALUES_NAME,
        GRADIENT_EIGENVECTORS_NAME,
        LAMBDA_MATRIX_NAME,
        NUM_ACTIVATION_COVARIANCE_PROCESSED,
        NUM_GRADIENT_COVARIANCE_PROCESSED,
        NUM_LAMBDA_PROCESSED,
    )
    from kronfluence_tpu.utils.dataset import BatchLoader
    from kronfluence_tpu.utils.dtypes import resolve_dtype

    t0 = time.time()
    probe_data = make_data(COV_BATCH, 99)
    probe = {k: v[:COV_BATCH] for k, v in probe_data.items()}
    specs = discover_stage_specs(model, task, params, probe, model.tracked_names)

    act_dt = resolve_dtype(factor_args.activation_covariance_dtype)
    grad_dt = resolve_dtype(factor_args.gradient_covariance_dtype)
    lam_dt = resolve_dtype(factor_args.lambda_dtype)

    @jax.jit
    def fabricate():
        cov = {
            ACTIVATION_COVARIANCE_MATRIX_NAME: {},
            GRADIENT_COVARIANCE_MATRIX_NAME: {},
            NUM_ACTIVATION_COVARIANCE_PROCESSED: {},
            NUM_GRADIENT_COVARIANCE_PROCESSED: {},
        }
        eig = {
            ACTIVATION_EIGENVECTORS_NAME: {},
            ACTIVATION_EIGENVALUES_NAME: {},
            GRADIENT_EIGENVECTORS_NAME: {},
            GRADIENT_EIGENVALUES_NAME: {},
        }
        lam = {LAMBDA_MATRIX_NAME: {}, NUM_LAMBDA_PROCESSED: {}}
        count = jnp.asarray(1024, jnp.int32)
        for name, spec in specs.items():
            da, dg = spec.activation_dim, spec.gradient_dim
            cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name] = (
                jnp.eye(da, dtype=act_dt) * 1024.0
            )
            cov[GRADIENT_COVARIANCE_MATRIX_NAME][name] = (
                jnp.eye(dg, dtype=grad_dt) * 1024.0
            )
            cov[NUM_ACTIVATION_COVARIANCE_PROCESSED][name] = count
            cov[NUM_GRADIENT_COVARIANCE_PROCESSED][name] = count
            eig[ACTIVATION_EIGENVECTORS_NAME][name] = jnp.eye(da, dtype=act_dt)
            eig[ACTIVATION_EIGENVALUES_NAME][name] = jnp.ones((da,), act_dt)
            eig[GRADIENT_EIGENVECTORS_NAME][name] = jnp.eye(dg, dtype=grad_dt)
            eig[GRADIENT_EIGENVALUES_NAME][name] = jnp.ones((dg,), grad_dt)
            lam[LAMBDA_MATRIX_NAME][name] = jnp.ones((dg, da), lam_dt)
            lam[NUM_LAMBDA_PROCESSED][name] = count.reshape((1,))
        return cov, eig, lam

    fab_cov, fab_eigen, fab_lambda = fabricate()
    jax.block_until_ready(fab_cov)

    # Resolve the query block up front (host math over spec probes) on a
    # COPY: the main flow re-resolves identically on the real score_args.
    warm_score_args = copy.deepcopy(score_args)
    if not warm_score_args.query_gradient_accumulation_steps:
        q_data = make_data(N_QUERY, 5)
        t_data = make_data(N_TRAIN, 6)
        q_loader = BatchLoader(q_data, QUERY_BATCH)
        probe_batch, _ = q_loader.probe()
        warm_score_args.query_gradient_accumulation_steps = (
            resolve_query_accumulation(
                model, task, params, probe_batch, q_loader,
                BatchLoader(t_data, TRAIN_BATCH), warm_score_args,
            )
        )
    else:
        q_data = make_data(N_QUERY, 5)
        t_data = make_data(N_TRAIN, 6)
    block = min(
        N_QUERY, QUERY_BATCH * warm_score_args.query_gradient_accumulation_steps
    )

    def warm_cov():
        force(
            fit_covariance_matrices_with_loader(
                model, params, task,
                BatchLoader(
                    make_data(N_COV, 1), COV_BATCH, indices=np.arange(2 * COV_BATCH)
                ),
                factor_args,
            )
        )

    def warm_eigh():
        force(perform_eigendecomposition(fab_cov, factor_args))

    def warm_lambda():
        force(
            fit_lambda_matrices_with_loader(
                model, params, task,
                BatchLoader(
                    make_data(N_LAMBDA, 3), LAMBDA_BATCH,
                    indices=np.arange(2 * LAMBDA_BATCH),
                ),
                factor_args, eigen_factors=fab_eigen,
            )
        )

    def warm_score():
        compute_pairwise_scores_with_loaders(
            model, params, task,
            BatchLoader(q_data, QUERY_BATCH, indices=np.arange(block)),
            BatchLoader(t_data, TRAIN_BATCH, indices=np.arange(2 * TRAIN_BATCH)),
            {**fab_eigen, **fab_lambda}, factor_args, warm_score_args,
        )

    # Staggered schedule: only eigh (the ~180s compile) runs on a thread;
    # cov -> lambda warm serially beside it. Running all four concurrently
    # co-resided the score stage's query block + precondition states with
    # every other stage's buffers and died RESOURCE_EXHAUSTED on the 16 GB
    # chip. The score warmup (the largest residents: query block + precond
    # states + train superstep transients) additionally waits for the eigh
    # thread to JOIN — measured 2026-08-20 on a fresh machine: with the
    # flash-attention train superstep, score's real train pass OOMs while
    # QDWH's multi-GB workspace is still live. cov+lambda (~120s) hide under
    # eigh's compile; only score pays serial time, and it alone holds the
    # chip when it runs.
    errors, durations = {}, {}

    def run(name, fn):
        s = time.time()
        try:
            fn()
        except Exception as exc:  # noqa: BLE001 — re-raised after join
            errors[name] = exc
        durations[name] = time.time() - s

    eigh_thread = threading.Thread(
        target=run, args=("eigh", warm_eigh), daemon=True
    )
    eigh_thread.start()
    for name, fn in (("cov", warm_cov), ("lambda", warm_lambda)):
        run(name, fn)
        if name in errors:
            break
    eigh_thread.join()
    if not errors:
        run("score", warm_score)
    if errors:
        name, exc = next(iter(errors.items()))
        raise RuntimeError(f"concurrent {name} warmup failed") from exc
    # Free the fabricated-factor precondition states now: left cached, the
    # ~1.6 GB (GPT-2 shapes) would stay pinned until the real score run
    # rebuilds the entry — overlapping the timed stages' residents.
    from kronfluence_tpu.utils.jit_cache import clear_value_cache

    clear_value_cache(model, "precond_states")
    warmups["concurrent"] = time.time() - t0
    log(
        "concurrent warmup: wall {:.1f}s (stages: {})".format(
            warmups["concurrent"],
            ", ".join(f"{n} {d:.1f}s" for n, d in durations.items()),
        )
    )


def main():
    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))

    # KRON_BENCH_CPU=1: run on the host CPU backend (control-flow smoke tests
    # only — the environment pins the TPU plugin, so a plain JAX_PLATFORMS
    # env var is ignored; the override must go through jax.config).
    if _env("CPU", 0):
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        _require_reachable_devices()

    import jax
    import jax.numpy as jnp

    from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
    from kronfluence_tpu.factor.eigen import (
        fit_lambda_matrices_with_loader,
        perform_eigendecomposition,
    )
    from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
    from kronfluence_tpu.prepare import prepare_model
    from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
    from kronfluence_tpu.task import Task
    from kronfluence_tpu.utils.common.factor_arguments import (
        smart_low_precision_factor_arguments,
    )
    from kronfluence_tpu.utils.common.score_arguments import (
        smart_low_precision_score_arguments,
    )
    from kronfluence_tpu.utils.dataset import BatchLoader

    import optax

    log(f"devices: {jax.devices()}")

    # KRON_BENCH_LAYERS/VOCAB/DMODEL shrink the model for CPU smoke tests of
    # the bench's own control flow (tests/test_examples.py); production runs
    # never set them.
    config = TransformerConfig(
        vocab_size=_env("VOCAB", 50257),
        max_seq_len=SEQ,
        num_layers=_env("LAYERS", 12),
        num_heads=_env("HEADS", 12),
        d_model=_env("DMODEL", 768),
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
    )
    module = TransformerLM(config)

    class WikitextStyleTask(Task):
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
            return self.compute_train_loss(batch, model)

        def get_influence_tracked_modules(self):
            names = []
            for i in range(config.num_layers):
                names += [
                    f"h_{i}/attn/c_attn",
                    f"h_{i}/attn/c_proj",
                    f"h_{i}/mlp/c_fc",
                    f"h_{i}/mlp/c_proj",
                ]
            return names

        def get_attention_mask(self, batch):
            return batch["attention_mask"]

    task = WikitextStyleTask()
    t0 = time.time()
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, SEQ), jnp.int32))[
            "params"
        ]
    )()
    jax.block_until_ready(params)
    if MODEL_FORM == "scan":
        from kronfluence_tpu.models.transformer import (
            scanned_lm_apply,
            stack_layer_params,
        )

        params = stack_layer_params(params, config.num_layers)
        model = prepare_model(scanned_lm_apply(config, remat=SCAN_REMAT), task)
    else:
        model = prepare_model(module, task)
    log(f"init params ({MODEL_FORM}): {time.time() - t0:.1f}s")

    def make_data(n, seed):
        """Synthetic tokens, pre-uploaded to the device: BatchLoader slices
        device-resident column stores on device, so steady-state timing
        measures the pipeline, not this environment's (slow, highly variable)
        tunneled host->device link. Real-host input feeding overlaps compute
        via the loader's prefetch + device_prefetch instead."""
        r = np.random.default_rng(seed)
        host = {
            "input_ids": r.integers(1, config.vocab_size, size=(n, SEQ)).astype(np.int32),
            "attention_mask": np.ones((n, SEQ), dtype=np.int32),
        }
        dev = jax.device_put(host)
        for v in dev.values():
            np.asarray(v[:1])  # force the upload off the timed path
        return dev

    factor_args = smart_low_precision_factor_arguments(strategy="ekfac")
    factor_args.use_empirical_fisher = True
    # On-device fp32 eigendecomposition (XLA QDWH by default; compile is
    # one-time per shape and persisted in .jax_cache).
    # KRON_BENCH_EIGH_SOLVER: auto|qdwh|jacobi|dc for solver A/B runs.
    factor_args.eigendecomposition_dtype = "float32"
    from kronfluence_tpu.arguments import FactorArguments

    solver = os.environ.get("KRON_BENCH_EIGH_SOLVER", "auto")
    FactorArguments(eigendecomposition_solver=solver)  # validate (typo guard)
    factor_args.eigendecomposition_solver = solver
    score_args = smart_low_precision_score_arguments()
    # Resolved to a concrete step count (auto or env override) before stage 4.
    score_args.query_gradient_accumulation_steps = QUERY_ACC or None
    # KRON_BENCH_QUERY_STORAGE: store resident query blocks in this dtype.
    # float8_e4m3fn halves the bf16 block's bytes, so twice the queries
    # amortize each train pass (see ops/quantize.py; scaled per
    # (query, module)). DEFAULT since 2026-08-21: the full-scale fp8 run is
    # recorded green (80-query blocks, 7 train passes, 15,603 pairs/s —
    # benchmarks/results/full_gpt2_wikitext_fp8_2026-08-21.json) and its
    # production-factor FULL-WIDTH fp8<->fp32 certificate over all
    # 481x4,656 pairs is Pearson 0.9714 / Spearman 0.9521
    # (results/fp8_fullwidth_fidelity_prodfactors_2026-08-21) — above the
    # reference's published 0.96 for ITS low-precision recipe.
    # KRON_BENCH_QUERY_STORAGE=none reproduces the unquantized bf16 runs.
    query_storage = os.environ.get("KRON_BENCH_QUERY_STORAGE", "float8_e4m3fn")
    # KRON_BENCH_DAMPING: "default" keeps the recipe's 1e-8 (reference
    # parity); "heuristic" sets damping_factor=None (0.1 x mean eigenvalue —
    # the fp8 fidelity warning's recommendation); a float sets it directly.
    _damp = os.environ.get("KRON_BENCH_DAMPING", "default")
    if _damp == "heuristic":
        score_args.damping_factor = None
    elif _damp not in ("", "default"):
        score_args.damping_factor = float(_damp)
    query_storage = None if query_storage.lower() in ("", "none", "0") else query_storage
    if query_storage:
        from kronfluence_tpu.arguments import ScoreArguments

        # Validate up front (typo guard): a bad dtype must not surface only
        # after the factor stages have run for tens of minutes.
        ScoreArguments(query_gradient_storage_dtype=query_storage)
        score_args.query_gradient_storage_dtype = query_storage

    def force(tree):
        jax.block_until_ready(tree)
        leaf = jax.tree_util.tree_leaves(tree)[0]
        float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    stages = {}
    warmups = {}

    if CONCURRENT_WARMUP:
        concurrent_stage_warmup(
            model, params, task, factor_args, score_args, make_data, force,
            warmups, log,
        )

    # ---- Stage 1: covariance ----
    # Warmups run on an INDEX-SLICE of the same device column store as the
    # measured run: the scanned stage loops (utils/scan_loop.py) compile one
    # program per column-store shape, so warming on a separate small dataset
    # would compile a different executable and the measured run would pay a
    # second compile/cache-load mid-"steady"-timing.
    cov_data = make_data(N_COV, 1)
    t0 = time.time()
    force(
        fit_covariance_matrices_with_loader(
            model, params, task,
            BatchLoader(cov_data, COV_BATCH, indices=np.arange(2 * COV_BATCH)),
            factor_args,
        )
    )
    warmups["cov"] = time.time() - t0
    log(f"covariance warmup (compile): {warmups['cov']:.1f}s")
    t0 = time.time()
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(cov_data, COV_BATCH), factor_args
    )
    force(cov)
    stages["cov"] = time.time() - t0
    cov_rate = N_COV / stages["cov"]
    log(f"covariance steady: {cov_rate:.1f} ex/s")

    if ONLY == "cov":
        print(json.dumps({
            "metric": "covariance_throughput", "value": round(cov_rate, 1),
            "unit": "examples/s",
            "vs_baseline": round(cov_rate / (REF_TRAIN / REF_COV_S), 2),
            "detail": {
                "n": N_COV, "batch": COV_BATCH,
                "steady_s": round(stages["cov"], 1),
                "warmup_s": round(warmups["cov"], 1),
            },
        }))
        return

    # ---- Stage 2: eigendecomposition (on-device Jacobi, actual dims) ----
    t0 = time.time()
    eigen = perform_eigendecomposition(cov, factor_args)
    force(eigen)
    warmups["eigh"] = time.time() - t0
    log(f"eigendecomposition warmup (compile): {warmups['eigh']:.1f}s")
    t0 = time.time()
    eigen = perform_eigendecomposition(cov, factor_args)
    force(eigen)
    stages["eigh"] = time.time() - t0
    log(f"eigendecomposition steady: {stages['eigh']:.1f}s")

    # ---- Stage 3: lambda ----
    lam_data = make_data(N_LAMBDA, 3)
    t0 = time.time()
    force(
        fit_lambda_matrices_with_loader(
            model, params, task,
            BatchLoader(lam_data, LAMBDA_BATCH, indices=np.arange(2 * LAMBDA_BATCH)),
            factor_args, eigen_factors=eigen,
        )
    )
    warmups["lambda"] = time.time() - t0
    log(f"lambda warmup (compile): {warmups['lambda']:.1f}s")
    t0 = time.time()
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(lam_data, LAMBDA_BATCH), factor_args,
        eigen_factors=eigen,
    )
    force(lam)
    stages["lambda"] = time.time() - t0
    lam_rate = N_LAMBDA / stages["lambda"]
    log(f"lambda steady: {lam_rate:.1f} ex/s")

    # NOTE: round 4 timed a "pipelined" eigh+lambda region here (a second
    # eigh dispatch + a second full lambda pass). Its own log measured
    # -0.2 s of eigh hidden — on a single-stream TPU the device QDWH time
    # cannot overlap device lambda math, so the region re-ran ~41 s of
    # work to learn nothing. Dropped from the default path (round-4 VERDICT
    # next-round #1); the shipped fit_all_factors path still hands eigen
    # factors to lambda in-flight, which hides the HOST side (fetch+save).
    # The raw covariances are dead weight from here on (~650 MB of HBM the
    # score stage's query block would otherwise compete with).
    del cov

    # EKFAC preconditioning needs only the eigendecomposition + lambda
    # artifacts (reference load_all_factors requirements matrix). Keep them on
    # device (fetching ~1 GB through this environment's tunnel can take
    # minutes-to-hours when the link degrades); the warmup scoring call below
    # derives the device precondition states — identity-cached on this dict —
    # after which the raw factor arrays are freed (`factors.clear()`), exactly
    # matching the real path's scoring-time memory footprint.
    factors = {**eigen, **lam}
    del eigen, lam

    # Build + identity-cache the device precondition states now, then free
    # the raw factor arrays: scoring reads only the cached states, and the
    # ~1 GB of raw factors would otherwise crowd out query-block HBM.
    from kronfluence_tpu.factor.covariance import discover_stage_specs
    from kronfluence_tpu.score.common import warm_precondition_state_cache

    probe = {k: v[:COV_BATCH] for k, v in make_data(COV_BATCH, 99).items()}
    spec_names = sorted(discover_stage_specs(model, task, params, probe, model.tracked_names))
    force(warm_precondition_state_cache(
        model, factors, factor_args.strategy, score_args, spec_names))
    fp32_score_args = None
    if FIDELITY:
        from kronfluence_tpu.arguments import ScoreArguments

        # fp32 blocks are 2x the bf16 footprint; accumulation=None lets the
        # driver size the fp32 block from the memory model independently.
        # Match the timed recipe's damping exactly: fidelity must isolate
        # the storage/compute dtype, not compare two different
        # preconditioners (KRON_BENCH_DAMPING changes both sides together).
        fp32_score_args = ScoreArguments(
            query_gradient_accumulation_steps=None,
            damping_factor=score_args.damping_factor,
        )
        force(warm_precondition_state_cache(
            model, factors, factor_args.strategy, fp32_score_args, spec_names))
    factors.clear()

    # ---- Stage 4: pairwise scores ----
    query_data = make_data(N_QUERY, 5)
    train_data = make_data(N_TRAIN, 6)
    query_acc = QUERY_ACC
    if query_acc == 0:
        from kronfluence_tpu.score.pairwise import resolve_query_accumulation

        q_probe_loader = BatchLoader(query_data, QUERY_BATCH)
        probe_batch, _ = q_probe_loader.probe()
        query_acc = resolve_query_accumulation(
            model, task, params, probe_batch, q_probe_loader,
            BatchLoader(train_data, TRAIN_BATCH), score_args,
        )
        log(
            f"auto query block: {QUERY_BATCH}x{query_acc} = "
            f"{QUERY_BATCH * query_acc} queries/block "
            f"({-(-N_QUERY // (QUERY_BATCH * query_acc))} train passes)"
        )
    score_args.query_gradient_accumulation_steps = query_acc
    # Warmup compiles the query/train/accumulate steps with ONE query block
    # over index-slices of the real stores (see the covariance warmup note).
    t0 = time.time()
    compute_pairwise_scores_with_loaders(
        model, params, task,
        BatchLoader(query_data, QUERY_BATCH,
                    indices=np.arange(min(N_QUERY, QUERY_BATCH * query_acc))),
        BatchLoader(train_data, TRAIN_BATCH, indices=np.arange(2 * TRAIN_BATCH)),
        factors, factor_args, score_args,
    )
    warmups["score"] = time.time() - t0
    log(f"pairwise warmup (compile): {warmups['score']:.1f}s")
    t0 = time.time()
    timed_scores = compute_pairwise_scores_with_loaders(
        model, params, task,
        BatchLoader(query_data, QUERY_BATCH), BatchLoader(train_data, TRAIN_BATCH),
        factors, factor_args, score_args,
    )
    stages["score"] = time.time() - t0
    pairs_rate = (N_QUERY * N_TRAIN) / stages["score"]
    log(f"pairwise steady: {pairs_rate:.0f} pairs/s")

    # ---- Totals vs the full reference workload + PRIMARY JSON LINE ----
    # Full mode (default): every stage RAN the reference-size workload above,
    # so `totals` are measured wall-clock, not extrapolations. Quick mode
    # scales the measured steady-state rates to the reference sizes.
    # The metric line prints NOW — optional phases below can only enrich it
    # with a second JSON line, never forfeit it (round-4 VERDICT weak #1).
    if QUICK:
        totals = {
            "cov": REF_TRAIN / cov_rate,
            "eigh": stages["eigh"],
            "lambda": REF_TRAIN / lam_rate,
            "score": REF_QUERY * REF_TRAIN / pairs_rate,
        }
    else:
        totals = dict(stages)
    grand = sum(totals.values())
    cold_total = grand + sum(warmups.values())
    ref = {"cov": REF_COV_S, "eigh": REF_EIGH_S, "lambda": REF_LAMBDA_S, "score": REF_SCORE_S}
    kind = "projected" if QUICK else "measured"
    log("")
    log(f"{'stage':<10}{'ours (s)':>10}{'A100 fp32 (s)':>15}{'speedup':>9}")
    for k in ("cov", "eigh", "lambda", "score"):
        log(f"{k:<10}{totals[k]:>10.1f}{ref[k]:>15.1f}{ref[k] / totals[k]:>8.1f}x")
    log(f"{'total':<10}{grand:>10.1f}{REF_TOTAL_S:>15.1f}{REF_TOTAL_S / grand:>8.1f}x")
    log(
        f"{kind} GPT-2/WikiText e2e: warm {grand:.0f}s, "
        f"cold (incl. {sum(warmups.values()):.0f}s compile) {cold_total:.0f}s "
        f"(ref fp32 {REF_TOTAL_S:.0f}s -> {REF_TOTAL_S / grand:.2f}x warm, "
        f"{REF_TOTAL_S / cold_total:.2f}x cold; "
        f"ref bf16 786s -> {786 / grand:.2f}x warm)"
    )

    record = {
        "metric": "gpt2_wikitext_ekfac_pairwise_throughput",
        "value": round(pairs_rate, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_rate / REF_PAIRS_PER_S, 3),
        "mode": "quick_projected" if QUICK else "full_measured",
        "model_form": MODEL_FORM,
        "chip": (
            "cpu (control-flow smoke)"
            if jax.default_backend() == "cpu"
            else f"{jax.devices()[0].device_kind} (tunneled, 1-core host)"
        ),
        "query_storage_dtype": query_storage,
        "query_block": QUERY_BATCH * query_acc,
        "e2e_warm_s": round(grand, 1),
        "e2e_cold_s": round(cold_total, 1),
        "e2e_vs_ref_fp32": round(REF_TOTAL_S / grand, 2),
        "stages_s": {k: round(v, 1) for k, v in totals.items()},
        "warmups_s": {k: round(v, 1) for k, v in warmups.items()},
    }
    print(json.dumps(record), flush=True)

    # ---- Optional phase: low-precision <-> fp32 score fidelity ----
    # Budgeted: the fp32 pass runs at roughly half the bf16 throughput, so
    # full width costs ~2.2x the timed score stage (+ compile slack). If the
    # remaining wall budget can't cover that, certify one query block
    # instead (labeled "one_block"); if not even that fits, skip. Any
    # exception here is logged, not raised — the metric above already stands.
    if FIDELITY:
        try:
            fidelity = _fidelity_phase(
                timed_scores, model, params, task, query_data, train_data,
                factors, factor_args, fp32_score_args, stages,
                timed_block=QUERY_BATCH * query_acc,
                timed_bytes=1 if (query_storage or "").startswith("float8") else 2,
            )
            if fidelity:
                record.update(fidelity)
                print(json.dumps(record), flush=True)
        except Exception as exc:  # noqa: BLE001 — metric already printed
            log(f"fidelity phase failed (metric above stands): {exc!r}")


def _fidelity_phase(
    timed_scores, model, params, task, query_data, train_data,
    factors, factor_args, fp32_score_args, stages,
    timed_block, timed_bytes,
):
    """Budget-aware fp32 fidelity certificate. Returns {} when skipped.

    Cost model: the fp32 comparison pass stores query blocks at 4 bytes/elem
    vs the timed run's `timed_bytes`, so its memory-sized block shrinks by
    that ratio and the pass count grows by it; each fp32 train pass also runs
    the fwd+bwd+psg math in fp32 (~1.8x a bf16-psg pass, measured r3/r5).
    The r4 bench died exactly here — a full-width fp32 pass after an fp8 run
    is ~7x the timed stage, not the 2.2x the old estimate assumed.
    """
    from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
    from kronfluence_tpu.utils.dataset import BatchLoader

    elapsed = time.time() - T_START
    remaining = BUDGET_S - elapsed
    passes_timed = max(1, -(-N_QUERY // max(timed_block, 1)))
    per_pass = stages["score"] / passes_timed
    block_fp32 = max(QUERY_BATCH, timed_block * timed_bytes // 4)
    passes_fp32 = -(-N_QUERY // block_fp32)
    est_full = passes_fp32 * per_pass * 1.8 + 60.0
    est_block = per_pass * 1.8 + 60.0
    if remaining >= est_full:
        n_q, scope = N_QUERY, "full_width"
    elif remaining >= est_block:
        n_q, scope = block_fp32, "one_block"
    else:
        log(
            f"fidelity: skipped — {remaining:.0f}s of budget left, one-block "
            f"pass needs ~{est_block:.0f}s"
        )
        return {}
    s_lowp = np.asarray(timed_scores["all_modules"], np.float64)[:n_q]
    log(
        f"fidelity [{scope}]: scoring {n_q} queries in fp32 "
        f"(budget {remaining:.0f}s left, est ~{est_full if scope == 'full_width' else est_block:.0f}s)"
    )
    s_fp32 = np.asarray(
        compute_pairwise_scores_with_loaders(
            model, params, task,
            BatchLoader(query_data, QUERY_BATCH, indices=np.arange(n_q)),
            BatchLoader(train_data, TRAIN_BATCH),
            factors, factor_args, fp32_score_args,
        )["all_modules"],
        np.float64,
    )
    pear, spear = [], []
    for q in range(n_q):
        a, b = s_lowp[q], s_fp32[q]
        pear.append(np.corrcoef(a, b)[0, 1])
        ra = np.argsort(np.argsort(a)).astype(np.float64)
        rb = np.argsort(np.argsort(b)).astype(np.float64)
        spear.append(np.corrcoef(ra, rb)[0, 1])
    # Neutral key names: the low-precision side is whatever the timed recipe
    # used (bf16 blocks or fp8 storage — see query_storage_dtype in the same
    # record). The old pearson_bf16_fp32 name misread as a bf16 regression
    # when an fp8 run's 0.9714 was compared against bf16 runs' 0.9994.
    fidelity = {
        "pearson_lowp_fp32": round(float(np.mean(pear)), 4),
        "spearman_lowp_fp32": round(float(np.mean(spear)), 4),
        "fidelity_scope": scope,
        "queries": n_q,
        "train": N_TRAIN,
    }
    log(
        f"low-precision<->fp32 score correlation ({n_q} queries x "
        f"{N_TRAIN} train, {scope}): pearson {fidelity['pearson_lowp_fp32']:.4f}, "
        f"spearman {fidelity['spearman_lowp_fp32']:.4f} "
        f"(reference publishes 0.96 over 481 queries)"
    )
    return fidelity


if __name__ == "__main__":
    main()
