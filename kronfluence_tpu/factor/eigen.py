"""Eigendecomposition and Lambda (EK-FAC eigenvalue correction) stage drivers.

Redesign of reference kronfluence/factor/eigen.py:140-462:

  * `perform_eigendecomposition` — normalized, symmetrized `eigh` per factor.
    float32 (the production TPU path) runs fully on device via the custom
    blocked Jacobi solver (ops/eigh.py — stock `jnp.linalg.eigh`'s QDWH
    compiles for minutes per shape); float64 runs on the host (LAPACK) to
    preserve the reference's fp64 numerics exactly for parity testing.

  * `fit_lambda_matrices_with_loader` — accumulates
    `Λ += Σ_b (Q_g^T g_b Q_a)^2` (reference: module/tracker/factor.py:204-230).
    Instead of materializing each per-sample gradient and sandwiching it with
    two dense matmuls, the activation/gradient *token* streams are rotated
    into the eigenbases first (`a @ Q_a`, `dy @ Q_g`) and the per-sample
    gradient is formed directly in the eigenbasis — algebraically identical
    (associativity of the Kronecker sandwich) and cheaper on the MXU whenever
    tokens-per-sample < activation_dim.
"""

from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.factor.config import get_factor_config
from kronfluence_tpu.factor.covariance import cast_params, loss_scale_for, train_loss_forward
from kronfluence_tpu.ops.covariance import per_sample_gradient as psg_op
from kronfluence_tpu.ops.flatten import activation_tokens_with_bias, gradient_tokens
from kronfluence_tpu.parallel.mesh import device_prefetch, factor_sharding, replicated, shard_batch
from kronfluence_tpu.prepare import PreparedModel
from kronfluence_tpu.task import Task
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
from kronfluence_tpu.utils.dtypes import accumulation_dtype, canonical_dtype_name, resolve_dtype
from kronfluence_tpu.utils.exceptions import FactorsNotFoundError


@jax.jit
def _normalize_stacked(stacked: jax.Array, counts: jax.Array) -> jax.Array:
    mats = stacked.astype(jnp.float32) / counts[:, None, None].astype(jnp.float32)
    return 0.5 * (mats + mats.transpose(0, 2, 1))


@partial(jax.jit, static_argnames=("target",))
def _normalize_pad_stacked(stacked: jax.Array, counts: jax.Array, target: int) -> jax.Array:
    """Normalize + symmetrize, then embed each (n, n) matrix in a (target,
    target) one whose padded diagonal sorts ABOVE the true spectrum (Gershgorin
    bound), so the appended eigenpairs land last in ascending order and are
    sliced off exactly. Lets nearly-equal dims (768 vs 769 = bias column,
    3072 vs 3073) share one batched eigh program — the QDWH executable is
    minutes of compile per distinct shape."""
    mats = _normalize_stacked(stacked, counts)
    x, n, _ = mats.shape
    if n == target:
        return mats
    bound = jnp.max(jnp.sum(jnp.abs(mats), axis=2), axis=1)
    big = jnp.zeros((x, target, target), mats.dtype)
    big = big.at[:, :n, :n].set(mats)
    d = jnp.arange(n, target)
    return big.at[:, d, d].set((4.0 * bound + 1.0)[:, None])


def _merge_dim_groups(groups: Dict[int, list]) -> Dict[int, list]:
    """Clusters same-shape factor groups whose dims differ by a tiny pad.

    Returns {target_dim: [(module_name, orig_dim), ...]}. Dims within
    max(8, dim // 256) of the next-larger dim are padded up to it (the
    bias-column off-by-one and similar near-misses); distant dims stay apart.
    """
    merged: Dict[int, list] = {}
    dims = sorted(groups, reverse=True)
    for dim in dims:
        target = dim
        for t in merged:
            if t >= dim and (t - dim) <= max(8, dim // 256):
                target = t
                break
        merged.setdefault(target, []).extend((n, dim) for n in groups[dim])
    return merged


_FACTOR_PAIRS = (
    (
        ACTIVATION_COVARIANCE_MATRIX_NAME,
        NUM_ACTIVATION_COVARIANCE_PROCESSED,
        ACTIVATION_EIGENVECTORS_NAME,
        ACTIVATION_EIGENVALUES_NAME,
    ),
    (
        GRADIENT_COVARIANCE_MATRIX_NAME,
        NUM_GRADIENT_COVARIANCE_PROCESSED,
        GRADIENT_EIGENVECTORS_NAME,
        GRADIENT_EIGENVALUES_NAME,
    ),
)


@partial(jax.jit, static_argnames=("target", "sizes"))
def _assemble_group(mats, counts, target, sizes):
    """Stack + normalize + symmetrize + pad one dim group in ONE dispatch.

    `mats`/`counts` are flat tuples of per-module arrays ordered to match
    `sizes` = ((n_matrices, orig_dim), ...) per sub-stack. Doing this inside
    one jitted program matters on a tunneled backend: built eagerly, the
    per-matrix count reshape/cast and the stacks cost hundreds of enqueue
    round-trips during which the device drains its queue and idles —
    measured ~4.5 s of the eigh stage's 13.6 s (solves alone are 9.1 s)."""
    parts = []
    i = 0
    for n_mats, _dim in sizes:
        stacked = jnp.stack(mats[i : i + n_mats])
        cnt = jnp.stack(
            [jnp.reshape(c, ()).astype(jnp.float32) for c in counts[i : i + n_mats]]
        )
        parts.append(_normalize_pad_stacked(stacked, cnt, target))
        i += n_mats
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


@partial(jax.jit, static_argnames=("dims", "dtype_names"))
def _split_group_results(evals, evecs, dims, dtype_names):
    """Batched (x, target[, target]) solver outputs -> per-module arrays in
    ONE dispatch. The per-module slice/renormalize/cast ops used to run as
    ~4 separate device calls per matrix — ~400 dispatches for GPT-2's 96
    factor matrices, several seconds of pure round-trip latency on a
    tunneled backend (measured: the stage ran 13.7 s while the batched
    solves alone take 9.1 s)."""
    target = evecs.shape[-1]
    out = []
    for i, (dim, dtype_name) in enumerate(zip(dims, dtype_names)):
        ev, vec = evals[i], evecs[i]
        if dim != target:
            # True eigenpairs sort first (ascending); their vectors'
            # padded-row components are ~eps. Slice and renormalize.
            ev = ev[:dim]
            vec = vec[:dim, :dim]
            vec = vec / jnp.linalg.norm(vec, axis=0, keepdims=True)
        out.append((ev.astype(dtype_name), vec.astype(dtype_name)))
    return tuple(out)


def _large_group_eigendecomposition(
    covariance_factors, eigen_factors, entries, scratch_dir=None
) -> None:
    """Per-matrix path for dims >= LARGE_EIGH_DIM (Llama MLP factors).

    Normalization and symmetrization happen HOST-side (an n^2 pass is
    milliseconds even on one core) so the device only ever holds the single
    matrix being solved plus its solver workspace; eigenpairs land host-side
    (eigh_large's contract). The batched `_assemble_group` path would put the
    whole group (~4.9 GB at 14336) plus workspace plus all eigenvectors on a
    16 GB chip at once — the exact OOM that killed the first recorded
    8B-shape run.

    `scratch_dir`: when given, each solved matrix's eigenpairs are
    checkpointed there immediately and reloaded on a rerun — at ~10+ min per
    14336^2 solve, a crash late in the stage must not forfeit the earlier
    solves (both recorded 2026-08-19/20 8B-shape failures died here). The
    orchestrator deletes the scratch once the aggregate artifact is saved.
    """
    from kronfluence_tpu.ops.eigh import eigh_large

    # Gather unsolved same-dim matrices so eigh_large can batch them through
    # one sweep program (KF_LARGE_EIGH_BATCH; cross-matrix amortization of
    # the per-round pivot dispatch chain). Checkpoints still land per matrix
    # via on_result, as each host-side result arrives.
    pending_by_dim: Dict[int, list] = {}
    for (pair_idx, module_name), _dim in entries:
        cov_name, count_name, evec_name, eval_name = _FACTOR_PAIRS[pair_idx]
        original = covariance_factors[cov_name][module_name]
        out_dtype = np.dtype(original.dtype)
        ckpt = None
        if scratch_dir is not None:
            safe = module_name.replace("/", "__")
            ckpt = Path(scratch_dir) / f"{eval_name}.{safe}.safetensors"
            if ckpt.exists():
                from kronfluence_tpu.utils.save import load_file

                saved = load_file(ckpt)
                eigen_factors[eval_name][module_name] = saved["evals"]
                eigen_factors[evec_name][module_name] = saved["evecs"]
                continue
        pending_by_dim.setdefault(original.shape[0], []).append(
            (pair_idx, module_name, out_dtype, ckpt)
        )

    # Stream CHUNKS of batch_k matrices through eigh_large rather than
    # stacking the whole group host-side: at the real 32-layer 8B recipe a
    # 96-matrix 14336^2 group would need ~79 GB for the stack plus as much
    # again for the stacked eigenpair return nobody reads. Host peak is now
    # ~2 x batch_k matrices (+ their eigenvectors), matching the pre-batching
    # footprint at the default batch_k=1.
    import os as _os

    batch_k = max(1, int(_os.environ.get("KF_LARGE_EIGH_BATCH", "1")))
    for dim, items in pending_by_dim.items():
        for c0 in range(0, len(items), batch_k):
            chunk = items[c0 : c0 + batch_k]
            mats = np.empty((len(chunk), dim, dim), np.float32)
            for j, (pair_idx, module_name, _dt, _ck) in enumerate(chunk):
                cov_name, count_name = _FACTOR_PAIRS[pair_idx][:2]
                count = float(np.asarray(covariance_factors[count_name][module_name]))
                M = np.asarray(
                    covariance_factors[cov_name][module_name], dtype=np.float32
                ) / count
                mats[j] = 0.5 * (M + M.T)

            def on_result(j, ev, vec, chunk=chunk):
                pair_idx, module_name, out_dtype, ckpt = chunk[j]
                _cov, _count, evec_name, eval_name = _FACTOR_PAIRS[pair_idx]
                evals = ev.astype(out_dtype)
                evecs = vec.astype(out_dtype)
                if ckpt is not None:
                    from kronfluence_tpu.utils.save import save_file

                    ckpt.parent.mkdir(parents=True, exist_ok=True)
                    tmp = ckpt.with_suffix(".tmp")
                    save_file({"evals": evals, "evecs": evecs}, tmp)
                    tmp.replace(ckpt)
                eigen_factors[eval_name][module_name] = evals
                eigen_factors[evec_name][module_name] = evecs

            eigh_large(mats, on_result=on_result)
            del mats


def _device_eigendecomposition(
    covariance_factors, eigen_factors, solver="auto", scratch_dir=None
) -> None:
    """fp32 on-device path: normalization, symmetrization, and the eigensolver
    all run on the accelerator, batched over same-dimension factor matrices;
    nothing round-trips to the host.

    Solvers: "auto"/"qdwh" = XLA's built-in eigh (fastest steady state, slow
    one-time compile per shape, amortized by the persistent cache); "jacobi" =
    the custom blocked-Jacobi solver (compiles in seconds; ~3-4x slower runs).
    """
    from kronfluence_tpu.ops.eigh import (
        LARGE_EIGH_DIM,
        eigh_batched,
        eigh_stock_batched,
        prewarm_stock_eigh,
    )

    if solver == "jacobi":
        solve = eigh_batched
    elif solver == "dc":
        from kronfluence_tpu.ops.eigh_dc import eigh_spectral_dc

        solve = eigh_spectral_dc
    else:  # "auto" / "qdwh"
        solve = eigh_stock_batched

    # Collect jobs across BOTH factor families before merging dim groups:
    # near-miss dims from different families (GPT-2: act 769 vs grad 768,
    # act 3073 vs grad 3072 — the bias column's off-by-one) then share one
    # batched solve. For GPT-2 this dispatches 3 programs ((60,769), (24,3073),
    # (12,2304)) instead of 5, so two of the minutes-long QDWH compiles
    # disappear and the big-dim solve runs as one larger batch.
    groups: Dict[int, list] = {}
    for pair_idx, (cov_name, _count, _evec, _eval) in enumerate(_FACTOR_PAIRS):
        for module_name, mat in covariance_factors[cov_name].items():
            groups.setdefault(mat.shape[0], []).append((pair_idx, module_name))
    merged = _merge_dim_groups(groups)
    # Hour-scale Llama-dim runs sit in silent device/compile waits for many
    # minutes; per-group progress makes them observable (INFO level).
    import logging

    from kronfluence_tpu.utils.logger import get_logger

    _log = get_logger("kronfluence_tpu.factor.eigen", level=logging.INFO)
    _log.info(
        "eigendecomposition groups: %s",
        {t: len(e) for t, e in merged.items()},
    )
    if solver in ("auto", "qdwh"):
        # Compile every group's QDWH executable on threads FIRST (the remote
        # compile server parallelizes distinct programs): cold eigh warmup
        # drops from the sum of per-shape compiles (~415 s for GPT-2's three
        # merged groups) to roughly the slowest one. No-op once warmed.
        small = [
            (len(entries), target)
            for target, entries in merged.items()
            if target < LARGE_EIGH_DIM
        ]
        if small:
            _log.info("prewarming QDWH executables for %s (blocks until compiled)", small)
        prewarm_stock_eigh(small)
    for target, entries in merged.items():
        _log.info(
            "eigendecomposition group dim=%d (%d matrices): %s",
            target, len(entries),
            "per-matrix eigh_large" if target >= LARGE_EIGH_DIM else solver,
        )
        if target >= LARGE_EIGH_DIM:
            # Llama-scale dims: NEVER assemble the group as one device batch
            # (6 x 14336^2 fp32 is ~4.9 GB before any solver workspace — the
            # failure mode of the first recorded 8B-shape run). Each matrix is
            # normalized host-side and solved alone; see eigh_large.
            _large_group_eigendecomposition(
                covariance_factors, eigen_factors, entries, scratch_dir
            )
            continue
        # Sub-stack per (family, original dim) — one static pad shape each —
        # concatenated into the shared (x, target, target) batch, all inside
        # ONE jitted assembly dispatch (see _assemble_group).
        by_key: Dict[tuple, list] = {}
        for (pair_idx, module_name), dim in entries:
            by_key.setdefault((dim, pair_idx), []).append(module_name)
        keys = sorted(by_key, key=lambda k: (-k[0], k[1]))
        order = [(k[1], n, k[0]) for k in keys for n in by_key[k]]
        mats, counts = [], []
        for dim, pair_idx in keys:
            cov_name, count_name = _FACTOR_PAIRS[pair_idx][:2]
            for n in by_key[(dim, pair_idx)]:
                mats.append(jnp.asarray(covariance_factors[cov_name][n]))
                counts.append(jnp.asarray(covariance_factors[count_name][n]))
        sizes = tuple((len(by_key[(dim, p)]), dim) for dim, p in keys)
        normalized = _assemble_group(tuple(mats), tuple(counts), target, sizes)
        evals, evecs = solve(normalized)
        dims = tuple(dim for _pair, _name, dim in order)
        dtype_names = tuple(
            str(jnp.asarray(covariance_factors[_FACTOR_PAIRS[p][0]][n]).dtype)
            for p, n, _d in order
        )
        split = _split_group_results(evals, evecs, dims, dtype_names)
        for (pair_idx, module_name, _dim), (ev, vec) in zip(order, split):
            _cov, _count, evec_name, eval_name = _FACTOR_PAIRS[pair_idx]
            eigen_factors[eval_name][module_name] = ev
            eigen_factors[evec_name][module_name] = vec


def _host_eigendecomposition(covariance_factors, eigen_factors, dtype_name) -> None:
    """fp64 host path (LAPACK): preserves the reference's float64 numerics
    exactly (reference: factor/eigen.py:193-213); used by the parity tests."""
    from kronfluence_tpu.utils.platform import fetch_tree

    host_factors = fetch_tree(covariance_factors)
    for cov_name, count_name, evec_name, eval_name in _FACTOR_PAIRS:
        for module_name, original in host_factors[cov_name].items():
            count = float(np.asarray(host_factors[count_name][module_name]).item())
            matrix = np.asarray(original, dtype=np.dtype(dtype_name)) / count
            matrix = 0.5 * (matrix + matrix.T)
            evals, evecs = np.linalg.eigh(matrix)
            dtype = original.dtype
            eigen_factors[eval_name][module_name] = np.ascontiguousarray(
                evals.astype(dtype)
            )
            eigen_factors[evec_name][module_name] = np.ascontiguousarray(
                evecs.astype(dtype)
            )


def perform_eigendecomposition(
    covariance_factors: Dict[str, Dict[str, np.ndarray]],
    factor_args: Optional[FactorArguments] = None,
    profiler=None,
    scratch_dir=None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Eigendecomposes both covariance factors of every module.

    float32 (production TPU path) runs entirely on device via the blocked
    Jacobi solver; float64 matches the reference's host LAPACK numerics.
    `scratch_dir` enables per-matrix crash checkpoints for >= LARGE_EIGH_DIM
    factors (see _large_group_eigendecomposition).
    """
    from kronfluence_tpu.utils.logger import PassThroughProfiler

    factor_args = factor_args or FactorArguments()
    profiler = profiler or PassThroughProfiler()
    dtype_name = canonical_dtype_name(factor_args.eigendecomposition_dtype)
    eigen_factors: Dict[str, Dict[str, Any]] = {
        name: {}
        for name in (
            ACTIVATION_EIGENVECTORS_NAME,
            ACTIVATION_EIGENVALUES_NAME,
            GRADIENT_EIGENVECTORS_NAME,
            GRADIENT_EIGENVALUES_NAME,
        )
    }
    if dtype_name == "float32" and jax.default_backend() != "cpu":
        solver = getattr(factor_args, "eigendecomposition_solver", "auto")
        with profiler.profile("Eigendecomposition: device eigh"):
            _device_eigendecomposition(
                covariance_factors, eigen_factors, solver, scratch_dir
            )
    else:
        with profiler.profile("Eigendecomposition: host fp64 eigh"):
            _host_eigendecomposition(covariance_factors, eigen_factors, dtype_name)
    return eigen_factors


def _make_lambda_update(
    model, task, tracked_key_, psg_dtype, lambda_dtype, sample, use_eigenbasis,
    iterative, remat, amp_dtype=None, amp_scale=None,
):
    """Pure per-batch update shared by the jitted step and the scanned loop."""
    lambda_accum = accumulation_dtype(lambda_dtype)
    tracked = list(tracked_key_) if tracked_key_ is not None else None
    post_process = task.enable_post_process_per_sample_gradient
    scale = loss_scale_for(amp_dtype, amp_scale)

    def _squared_psg_sum(a_tok, g_tok):
        """Σ_b (per-sample grad)^2 from rotated token streams.

        With `iterative` (reference: use_iterative_lambda_aggregation,
        module/tracker/factor.py:204-230) samples are processed one at a time
        under `lax.scan`, so only a single (out_dim, in_dim) gradient is ever
        materialized — the memory-bounded path for Llama-scale layers.
        """
        if not iterative:
            psg = psg_op(a_tok, g_tok, lambda_dtype)
            return jnp.sum(jnp.square(psg), axis=0).astype(lambda_accum)

        def body(acc, xs):
            a_one, g_one = xs
            psg = psg_op(a_one[None], g_one[None], lambda_dtype)[0]
            return acc + jnp.square(psg).astype(lambda_accum), None

        init = jnp.zeros((g_tok.shape[-1], a_tok.shape[-1]), lambda_accum)
        acc, _ = jax.lax.scan(body, init, (a_tok, g_tok))
        return acc

    def _lambda_contribution(spec, name, activations, output_gradients, valid, q_a, q_g):
        """Σ_b (projected per-sample grad)^2 for one module, one batch."""
        # Shared parameters (module applied multiple times per forward) must
        # sum per-sample gradients across uses *before* squaring
        # (reference: tracker/factor.py:275-301). Use counts are static at
        # trace time, so sharing is auto-detected — no flag needed.
        if post_process or len(activations) > 1:
            # Materialize raw per-sample gradients (summed over uses), apply
            # optional post-processing, then sandwich-project.
            psg = None
            for a, dy in zip(activations, output_gradients):
                a_tok = activation_tokens_with_bias(spec, a, psg_dtype)
                g_tok = gradient_tokens(spec, dy, valid, psg_dtype)
                contrib = psg_op(a_tok, g_tok, psg_dtype)
                psg = contrib if psg is None else psg + contrib
            if post_process:
                psg = task.post_process_per_sample_gradient(name, psg)
            psg = psg.astype(lambda_dtype)
            if use_eigenbasis:
                psg = jnp.einsum(
                    "po,boi,iq->bpq",
                    q_g.T.astype(lambda_dtype), psg, q_a.astype(lambda_dtype),
                )
            return jnp.sum(jnp.square(psg), axis=0).astype(lambda_accum)
        # Fast path: rotate token streams into the eigenbases first.
        total = None
        for a, dy in zip(activations, output_gradients):
            a_tok = activation_tokens_with_bias(spec, a, psg_dtype)
            g_tok = gradient_tokens(spec, dy, valid, psg_dtype)
            if use_eigenbasis:
                a_tok = jnp.matmul(a_tok, q_a, preferred_element_type=psg_dtype)
                g_tok = jnp.matmul(g_tok, q_g, preferred_element_type=psg_dtype)
            contrib = _squared_psg_sum(a_tok, g_tok)
            total = contrib if total is None else total + contrib
        return total

    def update(state, params, batch, valid, rng, q_a_all, q_g_all):
        params = cast_params(params, amp_dtype)
        forward = train_loss_forward(model, task, params, batch, sample, rng)
        _, captures = capture(forward, tracked, remat=remat, loss_scale=scale)
        num_valid = jnp.sum(valid.astype(jnp.int32))
        for name, cap in captures.items():
            state[name][LAMBDA_MATRIX_NAME] += _lambda_contribution(
                cap.spec, name, cap.activations, cap.output_gradients, valid,
                q_a_all.get(name), q_g_all.get(name),
            ).astype(state[name][LAMBDA_MATRIX_NAME].dtype)
            state[name][NUM_LAMBDA_PROCESSED] += num_valid.astype(
                state[name][NUM_LAMBDA_PROCESSED].dtype
            )
        return state

    return update


def _build_lambda_step(
    model, task, tracked_key_, psg_dtype, lambda_dtype, sample, mesh, use_eigenbasis,
    iterative, remat, amp_dtype=None, out_shardings=None, amp_scale=None,
):
    update = _make_lambda_update(
        model, task, tracked_key_, psg_dtype, lambda_dtype, sample, use_eigenbasis,
        iterative, remat, amp_dtype, amp_scale,
    )
    return partial(jax.jit, donate_argnums=(0,), out_shardings=out_shardings)(update)


def fit_lambda_matrices_with_loader(
    model: PreparedModel,
    params: Any,
    task: Task,
    loader,
    factor_args: Optional[FactorArguments] = None,
    eigen_factors: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    tracked_names: Optional[Sequence[str]] = None,
    mesh=None,
    profiler=None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Fits Lambda matrices (squared per-sample gradients in the eigenbasis)."""
    from kronfluence_tpu.factor.covariance import discover_stage_specs
    from kronfluence_tpu.utils.jit_cache import cached_step, tracked_key

    from kronfluence_tpu.utils.logger import PassThroughProfiler

    factor_args = factor_args or FactorArguments()
    profiler = profiler or PassThroughProfiler()
    tracked_names = tracked_names if tracked_names is not None else model.tracked_names
    config = get_factor_config(factor_args.strategy)
    use_eigenbasis = config.requires_eigendecomposition_for_lambda
    psg_dtype = resolve_dtype(factor_args.per_sample_gradient_dtype)
    lambda_dtype = resolve_dtype(factor_args.lambda_dtype)
    lambda_accum = accumulation_dtype(lambda_dtype)
    sample = not factor_args.use_empirical_fisher
    base_rng = jax.random.PRNGKey(factor_args.seed + 1)
    post_process = task.enable_post_process_per_sample_gradient

    if use_eigenbasis and eigen_factors is None:
        raise FactorsNotFoundError(
            f"Strategy {factor_args.strategy!r} requires eigendecomposition results "
            "for Lambda computations, but they were not provided."
        )

    from kronfluence_tpu.utils.dataset import probe_first

    try:
        first_batch, first_valid = probe_first(loader)
    except StopIteration:
        raise ValueError("Empty loader for lambda fitting.")
    specs = discover_stage_specs(model, task, params, first_batch, tracked_names)

    if use_eigenbasis:
        # Upload only this pass's eigenvectors (specs = the tracked subset):
        # under module partitioning at Llama scale the full set is ~5 GB of
        # 14336^2 matrices, and each pass needs only its own third.
        q_a_host = {
            name: jnp.asarray(arr, dtype=psg_dtype)
            for name, arr in eigen_factors[ACTIVATION_EIGENVECTORS_NAME].items()
            if name in specs
        }
        q_g_host = {
            name: jnp.asarray(arr, dtype=psg_dtype)
            for name, arr in eigen_factors[GRADIENT_EIGENVECTORS_NAME].items()
            if name in specs
        }
    else:
        q_a_host, q_g_host = {}, {}

    state = {
        name: {
            LAMBDA_MATRIX_NAME: jnp.zeros(
                (spec.gradient_dim, spec.activation_dim), lambda_accum
            ),
            NUM_LAMBDA_PROCESSED: jnp.zeros((), jnp.int32),
        }
        for name, spec in specs.items()
    }

    out_shardings = None
    if mesh is not None:
        # Lambda matrices of Llama-scale MLP layers shard over the model axis
        # instead of replicating (see factor_sharding).
        out_shardings = jax.tree_util.tree_map(
            lambda x: factor_sharding(mesh, x.shape), state
        )
        state = jax.device_put(state, out_shardings)

    iterative = factor_args.use_iterative_lambda_aggregation
    remat = factor_args.offload_activations_to_cpu
    amp_dtype = factor_args.amp_dtype
    tkey = tracked_key(tracked_names)
    sig = (
        "lambda", model.task_key(task), tkey, str(psg_dtype), str(lambda_dtype),
        sample, mesh, use_eigenbasis, iterative, remat, str(amp_dtype),
    )

    from kronfluence_tpu.utils.scan_loop import run_scanned, scan_plan, scanned_superstep

    plan = scan_plan(loader, mesh)
    if plan is not None:
        # Device-resident data, no mesh: one dispatch per scan chunk instead
        # of ~5 per batch (see utils/scan_loop.py).
        superstep = cached_step(
            model,
            sig + ("scan", plan.batch_size),
            lambda: scanned_superstep(
                _make_lambda_update(
                    model, task, tkey, psg_dtype, lambda_dtype, sample,
                    use_eigenbasis, iterative, remat, amp_dtype,
                    factor_args.amp_scale,
                ),
                plan.batch_size,
            ),
        )
        with profiler.profile("Lambda: scanned batch loop"):
            state = run_scanned(
                plan,
                state,
                lambda st, cols, starts, nv, idxs: superstep(
                    st, params, cols, starts, nv, idxs, base_rng, q_a_host, q_g_host
                ),
                progress_desc="Fitting lambda matrices",
            )
        with profiler.profile("Lambda: device sync"):
            jax.block_until_ready(state)
    else:
        step = cached_step(
            model,
            sig,
            lambda: _build_lambda_step(
                model, task, tkey, psg_dtype, lambda_dtype, sample, mesh,
                use_eigenbasis, iterative, remat, amp_dtype, out_shardings,
                factor_args.amp_scale,
            ),
        )

        step_idx = 0

        def run_batch(batch, valid):
            nonlocal state, step_idx
            rng = jax.random.fold_in(base_rng, step_idx)
            state = step(state, params, batch, valid, rng, q_a_host, q_g_host)
            step_idx += 1

        loader_iter = iter(loader)
        first_batch, first_valid = next(loader_iter)
        with profiler.profile("Lambda: first step (compile)"):
            run_batch(shard_batch(mesh, first_batch), shard_batch(mesh, first_valid))
        with profiler.profile("Lambda: batch loop"):
            for batch, valid in device_prefetch(loader_iter, mesh):
                run_batch(batch, valid)
        with profiler.profile("Lambda: device sync"):
            jax.block_until_ready(state)

    # Device-resident results; the save path bulk-fetches when persisting.
    result: Dict[str, Dict[str, Any]] = {LAMBDA_MATRIX_NAME: {}, NUM_LAMBDA_PROCESSED: {}}
    for name, mod_state in state.items():
        result[LAMBDA_MATRIX_NAME][name] = mod_state[LAMBDA_MATRIX_NAME].astype(lambda_dtype)
        result[NUM_LAMBDA_PROCESSED][name] = mod_state[NUM_LAMBDA_PROCESSED].reshape((1,))
    return result
