"""Shared scoring machinery: precondition-state preparation and per-sample
gradient assembly from captures."""

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.capture.engine import LayerCapture
from kronfluence_tpu.factor.config import FactorConfig, PreconditionState, get_factor_config
from kronfluence_tpu.ops.covariance import (
    conv_per_sample_gradient,
    per_sample_gradient as psg_op,
)
from kronfluence_tpu.ops.flatten import activation_tokens_with_bias, gradient_tokens
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.exceptions import FactorsNotFoundError


def precondition_cache_key(strategy: str, score_args: ScoreArguments, module_names):
    """Canonical jit-cache key for device precondition states (shared by the
    pairwise/self drivers and `warm_precondition_state_cache`)."""
    return (
        "precond_states", strategy, score_args.damping_factor,
        str(score_args.precondition_dtype), tuple(sorted(module_names)),
    )


def warm_precondition_state_cache(
    model, factors, strategy: str, score_args: ScoreArguments, module_names
):
    """Builds + identity-caches the device precondition states for `factors`.

    After this returns, score drivers called with the SAME `factors` object
    hit the cache and never read the factor contents again — callers that
    keep factors on device may then `factors.clear()` to free their HBM
    (used by the benchmarks; partitioned runs get the same reuse implicitly).
    """
    from kronfluence_tpu.utils.jit_cache import cached_value

    return cached_value(
        model,
        precondition_cache_key(strategy, score_args, module_names),
        factors,
        lambda: prepare_precondition_states(
            factors, strategy, score_args, sorted(module_names)
        ),
        # At most one set of device precondition states is kept alive per
        # model: a run with new score arguments evicts (frees the HBM of)
        # the previous run's states instead of pinning both forever.
        exclusive_group="precond_states",
    )


def prepare_precondition_states(
    factors: Dict[str, Dict[str, Any]],
    strategy: str,
    score_args: ScoreArguments,
    module_names: Sequence[str],
) -> Dict[str, PreconditionState]:
    """One-time damping/inversion per module (reference: pairwise.py:181-195,
    factor/config.py prepare methods). Host fp64, device-resident outputs."""
    config = get_factor_config(strategy)
    states = {}
    for name in module_names:
        module_factors = {
            factor_name: tensors[name]
            for factor_name, tensors in factors.items()
            if name in tensors
        }
        missing = [
            key for key in config.required_precondition_factors
            if key not in module_factors
        ]
        if missing:
            raise FactorsNotFoundError(
                f"Factors {missing} for module {name!r} are required by the "
                f"{strategy!r} strategy but absent from the factors dict. If you "
                "cleared factors after warm_precondition_state_cache, note the "
                "cache is keyed on (strategy, damping_factor, precondition_dtype, "
                "module set) — scoring with different arguments or partitions "
                "needs the factors reloaded."
            )
        states[name] = config.prepare(
            module_factors, score_args.damping_factor, score_args.precondition_dtype
        )
    return states


def module_per_sample_gradients(
    cap: LayerCapture,
    valid: Optional[jax.Array],
    dtype,
    task: Optional[Task] = None,
    module_name: Optional[str] = None,
) -> jax.Array:
    """(batch, out_dim, in_dim[+1]) per-sample gradients, summed over uses."""
    # KRON_CONV_DIRECT_PSG=1 routes conv modules through the patch-free
    # vmapped conv-backprop-filter (ops/covariance.py) instead of im2col;
    # read per call so measurement experiments can toggle it per process.
    conv_direct = os.environ.get("KRON_CONV_DIRECT_PSG", "0") == "1"
    total = None
    for a, dy in zip(cap.activations, cap.output_gradients):
        if conv_direct and cap.spec.kind == "conv2d":
            contrib = conv_per_sample_gradient(cap.spec, a, dy, valid, dtype)
        else:
            a_tok = activation_tokens_with_bias(cap.spec, a, dtype)
            g_tok = gradient_tokens(cap.spec, dy, valid, dtype)
            contrib = psg_op(a_tok, g_tok, dtype)
        total = contrib if total is None else total + contrib
    if task is not None and task.enable_post_process_per_sample_gradient:
        total = task.post_process_per_sample_gradient(module_name, total)
    return total


def measurement_forward(model, task, params, batch):
    def forward():
        return task.compute_measurement(batch, model.bind(params))

    return forward
