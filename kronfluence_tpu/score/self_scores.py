"""Self-influence score stage driver.

Redesign of reference kronfluence/score/self.py:135-443. One pass over the
train loader; per batch each module's per-sample gradients are preconditioned
and dotted with themselves (g^T H^-1 g). The measurement variant preconditions
the measurement gradient and dots it with the train-loss gradient — both
captures run inside a single jitted step (the reference needs two backward
passes with mode switches per batch).
"""

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.utils.dataset import probe_first
from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.factor.config import get_factor_config
from kronfluence_tpu.factor.covariance import cast_params, discover_stage_specs, train_loss_forward
from kronfluence_tpu.parallel.mesh import device_prefetch, replicated, shard_batch
from kronfluence_tpu.prepare import PreparedModel
from kronfluence_tpu.score.common import (
    measurement_forward,
    module_per_sample_gradients,
    warm_precondition_state_cache,
)
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.constants import ALL_MODULE_NAME
from kronfluence_tpu.utils.dtypes import resolve_dtype
from kronfluence_tpu.utils.jit_cache import cached_step, tracked_key
from kronfluence_tpu.utils.platform import fetch_tree


def compute_self_scores_with_loaders(
    model: PreparedModel,
    params: Any,
    task: Task,
    train_loader,
    factors: Dict[str, Dict[str, np.ndarray]],
    factor_args: FactorArguments,
    score_args: Optional[ScoreArguments] = None,
    tracked_names: Optional[Sequence[str]] = None,
    mesh=None,
    profiler=None,
) -> Dict[str, np.ndarray]:
    """Computes self-influence scores; returns {module or 'all_modules': (N,)}."""
    from kronfluence_tpu.utils.logger import PassThroughProfiler

    score_args = score_args or ScoreArguments()
    profiler = profiler or PassThroughProfiler()
    tracked_names = tracked_names if tracked_names is not None else model.tracked_names
    strategy_config = get_factor_config(factor_args.strategy)
    psg_dtype = resolve_dtype(score_args.per_sample_gradient_dtype)
    precond_dtype = resolve_dtype(score_args.precondition_dtype)
    score_dtype = resolve_dtype(score_args.score_dtype)
    per_module = score_args.compute_per_module_scores
    use_measurement = score_args.use_measurement_for_self_influence

    probe_batch, _ = probe_first(train_loader)
    specs = discover_stage_specs(model, task, params, probe_batch, tracked_names)
    # Identity-cached on the factors object (see pairwise.py): partitioned
    # runs must not re-transfer factors host->device per partition.
    with profiler.profile("Self-influence: prepare precondition states"):
        precondition_states = warm_precondition_state_cache(
            model, factors, factor_args.strategy, score_args, sorted(specs)
        )
    tkey = tracked_key(tracked_names)
    tracked = list(tkey) if tkey is not None else None

    amp_dtype = score_args.amp_dtype
    remat = score_args.offload_activations_to_cpu
    out_shardings = replicated(mesh) if mesh is not None else None

    def make_apply():
        """Pure per-batch scoring body shared by the jitted step and the
        scanned loop."""

        def apply(params, batch, valid, precondition_states):
            params = cast_params(params, amp_dtype)
            loss_forward = train_loss_forward(
                model, task, params, batch, sample=False, rng=jax.random.PRNGKey(0)
            )
            _, loss_caps = capture(loss_forward, tracked, remat=remat)
            if use_measurement:
                _, meas_caps = capture(
                    measurement_forward(model, task, params, batch), tracked, remat=remat
                )
            per_module_scores = {}
            for name, cap in loss_caps.items():
                loss_psg = module_per_sample_gradients(cap, valid, psg_dtype, task, name)
                src_psg = (
                    module_per_sample_gradients(
                        meas_caps[name], valid, psg_dtype, task, name
                    )
                    if use_measurement
                    else loss_psg
                )
                preconditioned = strategy_config.precondition(
                    src_psg.astype(precond_dtype), precondition_states[name]
                )
                score = jnp.einsum(
                    "boi,boi->b", preconditioned.astype(psg_dtype), loss_psg
                ).astype(score_dtype)
                per_module_scores[name] = score
            if per_module:
                return per_module_scores
            total = None
            for score in per_module_scores.values():
                total = score if total is None else total + score
            return {ALL_MODULE_NAME: total}

        return apply

    from functools import partial

    from kronfluence_tpu.utils.scan_loop import (
        run_scanned_map,
        scan_plan,
        scanned_map_superstep,
    )

    sig = (
        "self", model.task_key(task), tkey, tuple(sorted(score_args.to_str_dict().items())),
        factor_args.strategy, per_module, use_measurement, str(amp_dtype), remat,
        mesh,
    )
    plan = scan_plan(train_loader, mesh)
    if plan is not None:
        # Device-resident train data, no mesh: one dispatch per scan chunk
        # instead of ~3 per batch (see utils/scan_loop.py) — decisive for
        # small/conv models whose steps are faster than the dispatch latency.
        def _build_scan_step():
            apply = make_apply()
            return scanned_map_superstep(
                lambda batch, valid, p, ps: apply(p, batch, valid, ps),
                plan.batch_size,
            )

        superstep = cached_step(model, sig + ("scan", plan.batch_size), _build_scan_step)
        with profiler.profile("Self-influence: train pass"):
            chunk_outs = run_scanned_map(
                plan,
                lambda cols, starts, nv: superstep(
                    cols, starts, nv, params, precondition_states
                ),
            )
        with profiler.profile("Self-influence: score fetch"):
            chunk_outs = fetch_tree(chunk_outs)
        return {
            key: np.concatenate([c[key] for c in chunk_outs], axis=0).reshape(
                (-1,) + chunk_outs[0][key].shape[2:]
            )[: train_loader.num_examples]
            for key in chunk_outs[0]
        }

    step = cached_step(
        model,
        sig,
        lambda: partial(jax.jit, out_shardings=out_shardings)(make_apply()),
    )

    # Device-resident chunks + one bulk fetch: keeps the dispatch loop
    # pipelined instead of serializing on per-batch host transfers.
    chunks: Dict[str, List[Any]] = {}
    with profiler.profile("Self-influence: train pass"):
        for batch, valid_dev in device_prefetch(train_loader, mesh):
            scores = step(params, batch, valid_dev, precondition_states)
            for key, val in scores.items():
                chunks.setdefault(key, []).append(val)
    with profiler.profile("Self-influence: score fetch"):
        chunks = fetch_tree(chunks)

    return {
        key: np.concatenate(vals, axis=0)[: train_loader.num_examples]
        for key, vals in chunks.items()
    }
