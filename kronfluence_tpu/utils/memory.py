"""Analytic device-memory model for executable batch sizing.

XLA has no recoverable OOM, so the reference's run-and-halve search
(kronfluence/utils/dataset.py:66-101, factor_computer.py:110-157) cannot be
ported. Instead the per-example device footprint of each stage is estimated
from the *actual probe batch*: tracked-layer token counts come from the
discovery avals (so sequence length and conv spatial size are exact, not the
reference's guess), per-module dimensions from the LayerSpecs, and the
remat / iterative-lambda flags change the model where they change liveness.
The chosen batch size fills a configurable fraction of the measured free HBM.

The estimate is deliberately conservative (a too-small batch costs a few
percent of throughput; a too-large one kills the run), but every term scales
with the true workload shape.
"""

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

#: Fraction of free HBM the per-batch working set may fill. The rest covers
#: XLA scratch, fusion temporaries, and transfer double-buffering.
DEFAULT_BUDGET_FRACTION = 0.5

#: Without remat, untracked intermediates (attention scores, layernorms,
#: activations between tracked layers) survive to the backward pass; their
#: size is workload-dependent but empirically a small multiple of the tracked
#: token streams for transformer/conv nets.
RESIDUAL_MULTIPLIER = 2.0
RESIDUAL_MULTIPLIER_REMAT = 1.0


@dataclasses.dataclass
class ModuleProbe:
    """Per-module shape facts measured from one discovery trace."""

    spec: Any
    tokens: int  # flattened token rows per dataset example, per use
    uses: int


def probe_modules(
    model: Any,
    task: Any,
    params: Any,
    batch: Any,
    batch_size: int,
) -> Dict[str, ModuleProbe]:
    """Discovers tracked modules and their true per-example token counts.

    `batch_size` is the number of dataset examples in `batch` (folded choice
    dims count toward tokens, matching flatten semantics).
    """
    from kronfluence_tpu.capture.engine import discover_specs
    from kronfluence_tpu.factor.covariance import train_loss_forward

    rng = jax.random.PRNGKey(0)
    forward = train_loss_forward(model, task, params, batch, sample=False, rng=rng)
    specs, out_shapes = discover_specs(forward, model.tracked_names)
    probes: Dict[str, ModuleProbe] = {}
    for name, spec in specs.items():
        shapes = out_shapes[name]
        rows = sum(int(np.prod(s.shape[:-1])) for s in shapes)
        probes[name] = ModuleProbe(
            spec=spec,
            tokens=max(1, rows // max(1, batch_size)),
            uses=len(shapes),
        )
    return probes


def _dtype_bytes(dtype: Any, default: int = 4) -> int:
    try:
        return int(np.dtype(jax.numpy.dtype(dtype)).itemsize)
    except Exception:
        return default


def per_example_bytes(
    probes: Dict[str, ModuleProbe],
    stage: str,
    *,
    capture_bytes: int = 4,
    stage_bytes: int = 4,
    psg_bytes: int = 4,
    remat: bool = False,
    iterative_lambda: bool = False,
) -> float:
    """Bytes of per-example device state live during one `stage` step.

    Terms per tracked module (per use):
      * captured activation + output-gradient token streams (all stages);
      * untracked-intermediate residuals, cut to ~1x by remat;
      * covariance: flattened masked copies in the accumulation dtype;
      * lambda: the materialized per-sample gradient (skipped when
        `use_iterative_lambda_aggregation` scans examples one at a time —
        reference arguments.py:116-122 semantics);
      * pairwise/self: per-sample gradients (+preconditioned copy for self).
        These materialize ONE MODULE AT A TIME — the score drivers contract
        each module's gradient inside a per-module Python loop of the traced
        step, so only the current module's block (plus the next being built)
        is live, not the sum over modules. The peak is therefore
        2 x max-module, which matches the measured v5e footprint of the
        GPT-2 bench train pass (~5 GB at batch 16) where a sum-over-modules
        term would claim ~7.5 GB.
    """
    stream = 0.0
    extra = 0.0
    psg_peak = 0.0
    for probe in probes.values():
        spec = probe.spec
        d_in = spec.activation_dim
        d_out = spec.gradient_dim
        # conv activations are captured raw (C_in channels), patches are a
        # stage-local expansion; linear activations are the stream itself.
        raw_in = spec.in_dim if spec.kind == "linear" else max(1, spec.in_dim)
        use_stream = probe.tokens * (raw_in + d_out) * capture_bytes
        stream += probe.uses * use_stream
        if stage == "covariance":
            extra += probe.uses * probe.tokens * (d_in + d_out) * stage_bytes
        elif stage == "lambda":
            if not iterative_lambda:
                extra += d_in * d_out * psg_bytes
        elif stage in ("pairwise", "self"):
            factor = 2 if stage == "self" else 1
            psg_peak = max(psg_peak, factor * d_in * d_out * psg_bytes)
    if stage in ("pairwise", "self"):
        extra += 2 * psg_peak
    residual = RESIDUAL_MULTIPLIER_REMAT if remat else RESIDUAL_MULTIPLIER
    return residual * stream + extra


def static_bytes(
    probes: Dict[str, ModuleProbe],
    stage: str,
    params: Any = None,
    *,
    state_bytes: int = 4,
) -> float:
    """Per-run device state independent of batch size: parameters plus the
    stage's factor / eigenvector / precondition-state arrays."""
    total = 0.0
    if params is not None:
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "size"):
                total += leaf.size * _dtype_bytes(getattr(leaf, "dtype", None))
    for probe in probes.values():
        d_in = probe.spec.activation_dim
        d_out = probe.spec.gradient_dim
        if stage == "covariance":
            total += (d_in * d_in + d_out * d_out) * state_bytes
        elif stage == "lambda":
            # eigenvectors in + lambda accumulator
            total += (d_in * d_in + d_out * d_out + d_in * d_out) * state_bytes
        elif stage in ("pairwise", "self"):
            # precondition state: two eigenvector matrices + inverse lambda
            total += (d_in * d_in + d_out * d_out + d_in * d_out) * state_bytes
    return total


def query_block_bytes(
    probes: Dict[str, ModuleProbe],
    score_args: Any,
    num_queries: int,
) -> float:
    """Resident bytes of one preconditioned query-gradient block.

    This is the largest resident of the pairwise stage (it stays in HBM for an
    entire pass over the train loader — reference loop nest:
    kronfluence/score/pairwise.py:217-280). Per query and module the block
    holds either the dense (o, i) gradient in `score_dtype`, its quantized
    payload + one fp32 scale (`query_gradient_storage_dtype`), or the low-rank
    (rank, o) + (rank, i) SVD pair when `query_gradient_low_rank` applies
    (min(o, i) > rank, matching the driver's routing in score/pairwise.py).
    """
    from kronfluence_tpu.utils.dtypes import resolve_dtype

    rank = getattr(score_args, "query_gradient_low_rank", None)
    storage = getattr(score_args, "query_gradient_storage_dtype", None)
    score_b = _dtype_bytes(resolve_dtype(score_args.score_dtype))
    per_query = 0.0
    for probe in probes.values():
        d_in = probe.spec.activation_dim
        d_out = probe.spec.gradient_dim
        if rank is not None and min(d_in, d_out) > rank:
            per_query += rank * (d_in + d_out) * score_b
        elif storage is not None:
            per_query += d_in * d_out * _dtype_bytes(resolve_dtype(storage)) + 4
        else:
            per_query += d_in * d_out * score_b
    return num_queries * per_query


#: Fraction of the device's HBM limit the pairwise stage may plan against.
#: Unlike DEFAULT_BUDGET_FRACTION (which absorbs *unmodeled* working sets),
#: the block sizer subtracts every major resident explicitly (params,
#: precondition state, per-train-batch capture + per-sample gradients, score
#: chunks), so only XLA scratch and fragmentation need headroom.
PAIRWISE_BUDGET_FRACTION = 0.9


def max_queries_per_block(
    probes: Dict[str, ModuleProbe],
    score_args: Any,
    *,
    params: Any = None,
    train_batch_size: int = 1,
    num_train: int = 0,
    budget_bytes: Optional[float] = None,
    reserve_bytes: float = 0.0,
    max_queries: int = 4096,
    query_batch_size: int = 8,
) -> int:
    """Largest query count whose resident block fits alongside the train pass.

    `reserve_bytes` subtracts caller-known residents the model cannot see —
    e.g. a second precondition-state cache kept live for a fidelity
    comparison run (the unmodeled ~1.6 GB that OOMed the first fp8 full
    bench).

    Models the full pairwise working set: `static_bytes` (params +
    precondition state), one train batch's capture streams and hoisted
    per-sample gradients (`per_example_bytes`), the accumulated on-device
    score chunks (num_train columns per query), and the block itself. This is
    the term the r02 bench OOM proved necessary: the block is sized so that
    exactly ONE block plus one train pass fits, and the stage driver keeps at
    most one block live (score/pairwise.py drops each block before building
    the next).
    """
    from kronfluence_tpu.utils.dtypes import resolve_dtype

    if budget_bytes is None:
        limit = _device_hbm_limit()
        budget_bytes = limit * PAIRWISE_BUDGET_FRACTION
    budget = budget_bytes - reserve_bytes - static_bytes(probes, "pairwise", params)
    remat = bool(getattr(score_args, "offload_activations_to_cpu", False))
    amp = getattr(score_args, "amp_dtype", None)
    capture_b = _dtype_bytes(resolve_dtype(amp)) if amp is not None else 4
    psg_b = _dtype_bytes(resolve_dtype(score_args.per_sample_gradient_dtype))
    budget -= train_batch_size * per_example_bytes(
        probes, "pairwise", capture_bytes=capture_b, psg_bytes=psg_b, remat=remat
    )
    score_b = _dtype_bytes(resolve_dtype(score_args.score_dtype))
    tokens = max(
        (p.tokens for p in probes.values()), default=1
    )  # per-token scores carry the sequence axis
    per_token = bool(getattr(score_args, "compute_per_token_scores", False))
    per_query_scores = num_train * (tokens if per_token else 1) * score_b
    per_query = query_block_bytes(probes, score_args, 1) + per_query_scores
    if getattr(score_args, "query_gradient_storage_dtype", None) is not None:
        # Quantized dequantize transient: the per-chunk optimization barrier
        # + per-module token chain (score/pairwise.py:_tie_chunk_to_loop and
        # the `token` serialization) keep ONE query-batch chunk of ONE module
        # dense at a time, so the transient is chunk-sized and does NOT scale
        # with the block's total query count. CALIBRATED against compiler
        # memory_analysis (benchmarks/micro_fp8_memory.py, 2026-08-19): the
        # fp8 train superstep's TEMP grows only ~1.6 MB/query from 40->72
        # queries (5.06 -> 5.11 GiB at train batch 16) — one (8, o_max,
        # i_max) bf16 chunk is ~38 MB, matching. Budget 2 chunks (current +
        # next being built). The PREVIOUS model charged 2 x max_module PER
        # QUERY (~680 MB phantom at 72 queries), which both under-approved
        # fp8 blocks and postdated the real OOM cause (pre-token-chain
        # scheduling, fixed in r3's final snapshot).
        max_module_oi = max(
            (p.spec.activation_dim * p.spec.gradient_dim for p in probes.values()),
            default=0,
        )
        budget -= 2 * query_batch_size * max_module_oi * psg_b
    if per_query <= 0:
        return max_queries
    return max(1, min(max_queries, int(budget // per_query)))


def log_hbm(label: str) -> None:
    """Logs live/peak HBM when KF_MEM_LOG=1 (observability for OOM hunts).

    `memory_stats()` is a host round-trip on tunneled backends — keep this
    behind the env gate, never in steady-state timing paths by default."""
    if not os.environ.get("KF_MEM_LOG"):
        return
    import sys

    device = jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    print(
        "HBM[%s]: in_use %.2f GB, peak %.2f GB, limit %.2f GB" % (
            label,
            stats.get("bytes_in_use", 0) / 1024**3,
            stats.get("peak_bytes_in_use", 0) / 1024**3,
            stats.get("bytes_limit", 0) / 1024**3,
        ),
        file=sys.stderr, flush=True,
    )


def _device_hbm_limit() -> float:
    device = jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    return float(stats.get("bytes_limit", 15 * 1024**3))


def device_memory_budget(fraction: float = DEFAULT_BUDGET_FRACTION) -> float:
    """Free-HBM budget in bytes, from live device stats when available."""
    device = jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    limit = stats.get("bytes_limit", 15 * 1024**3)
    in_use = stats.get("bytes_in_use", 0)
    return max(limit - in_use, limit // 4) * fraction


def estimate_batch_size(
    probes: Dict[str, ModuleProbe],
    stage: str,
    *,
    params: Any = None,
    factor_args: Any = None,
    score_args: Any = None,
    budget_bytes: Optional[float] = None,
    max_batch_size: int = 4096,
) -> int:
    """Largest per-device batch size whose working set fits the budget."""
    from kronfluence_tpu.utils.dtypes import resolve_dtype

    remat = False
    iterative = False
    capture_b = 4
    stage_b = 4
    psg_b = 4
    if factor_args is not None:
        remat = bool(getattr(factor_args, "offload_activations_to_cpu", False))
        iterative = bool(getattr(factor_args, "use_iterative_lambda_aggregation", False))
        amp = getattr(factor_args, "amp_dtype", None)
        if amp is not None:
            capture_b = _dtype_bytes(resolve_dtype(amp))
        if stage == "covariance":
            stage_b = _dtype_bytes(resolve_dtype(factor_args.activation_covariance_dtype))
        psg_b = _dtype_bytes(resolve_dtype(factor_args.per_sample_gradient_dtype))
    if score_args is not None:
        remat = remat or bool(getattr(score_args, "offload_activations_to_cpu", False))
        amp = getattr(score_args, "amp_dtype", None)
        if amp is not None:
            capture_b = _dtype_bytes(resolve_dtype(amp))
        psg_b = _dtype_bytes(resolve_dtype(score_args.per_sample_gradient_dtype))
    per_example = per_example_bytes(
        probes,
        stage,
        capture_bytes=capture_b,
        stage_bytes=stage_b,
        psg_bytes=psg_b,
        remat=remat,
        iterative_lambda=iterative,
    )
    if budget_bytes is None:
        budget_bytes = device_memory_budget()
    budget_bytes -= static_bytes(probes, stage, params)
    if per_example <= 0:
        return max_batch_size
    fit = int(budget_bytes // per_example)
    return max(1, min(max_batch_size, fit))
