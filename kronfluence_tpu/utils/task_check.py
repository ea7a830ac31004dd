"""Task-configuration verification: catch user errors with clear messages.

The reference documents its Task contract (summed losses, binary attention
masks; DOCUMENTATION.md:155-181) and its test suite keeps "wrong task"
fixtures (tests/utils.py:72-155, e.g. WrongClassificationTask) to show what
misconfiguration does — but it never *detects* them at runtime; a mean-reduced
loss silently produces wrong influence scores. `verify_task_configuration`
closes that gap with cheap probe-batch checks that raise
`IllegalTaskConfigurationError` before any expensive stage runs:

  * the train loss / measurement must be scalar;
  * the train loss must be summed over the batch, not averaged — checked by
    duplicating the probe batch, which exactly doubles a summed loss (exact
    even under BatchNorm, since duplicated rows leave batch statistics
    unchanged) but leaves an averaged one fixed;
  * an attention mask must shape-match some tracked linear module's token
    rows, since mis-sized masks are otherwise silently ignored (matching
    reference linear.py:33-46 semantics);
  * a dict attention mask may only name tracked modules;
  * `get_influence_tracked_modules` names must exist in the model.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.utils.exceptions import (
    IllegalTaskConfigurationError,
    TrackedModuleNotFoundError,
)


def _duplicate_batch(batch: Any) -> Any:
    def dup(x):
        arr = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(arr, "ndim", 0) >= 1:
            return jnp.concatenate([jnp.asarray(arr), jnp.asarray(arr)], axis=0)
        return arr

    return jax.tree_util.tree_map(dup, batch)


def _check_scalar(value: jax.Array, what: str) -> None:
    shape = getattr(value, "shape", None)
    if shape is None or len(shape) != 0:
        raise IllegalTaskConfigurationError(
            f"{what} must return a scalar (summed over the batch); got shape "
            f"{shape}. Sum per-sample values, e.g. `jnp.sum(losses)`."
        )


def verify_task_configuration(
    model: Any,
    params: Any,
    task: Any,
    batch: Any,
    rtol: float = 1e-3,
) -> None:
    """Validates a (model, task) pair on one probe batch; raises on misuse.

    Cheap (two forward passes, no backward); call it once before fitting
    factors. `Analyzer.verify_task` wraps this with a dataset probe.
    """
    from kronfluence_tpu.capture.engine import discover_specs

    bound = model.bind(params)

    # -- Scalar checks (shape-only, no FLOPs). --
    loss_shape = jax.eval_shape(lambda: task.compute_train_loss(batch, bound))
    _check_scalar(loss_shape, "compute_train_loss")
    measurement_shape = jax.eval_shape(lambda: task.compute_measurement(batch, bound))
    _check_scalar(measurement_shape, "compute_measurement")

    # -- Summed-vs-averaged loss. --
    loss_1 = float(jax.jit(lambda: task.compute_train_loss(batch, bound))())
    dup = _duplicate_batch(batch)
    loss_2 = float(jax.jit(lambda: task.compute_train_loss(dup, bound))())
    if abs(loss_2 - 2.0 * loss_1) > rtol * max(abs(2.0 * loss_1), 1e-8):
        hint = (
            "it stays constant under batch duplication, which indicates a "
            "mean-reduced loss"
            if abs(loss_2 - loss_1) <= rtol * max(abs(loss_1), 1e-8)
            else "it does not double under batch duplication"
        )
        raise IllegalTaskConfigurationError(
            f"compute_train_loss must be SUMMED over the batch: {hint} "
            f"(loss={loss_1:.6g}, duplicated-batch loss={loss_2:.6g}). Use "
            "`reduction='sum'`-style losses; influence accumulation assumes "
            "per-sample additivity."
        )

    # -- Tracked-module discovery for mask / name validation. --
    def forward():
        return task.compute_train_loss(batch, bound)

    specs, out_shapes = discover_specs(forward, model.tracked_names)
    if model.tracked_names is not None:
        missing = sorted(set(model.tracked_names) - set(specs))
        if missing:
            raise TrackedModuleNotFoundError(
                f"get_influence_tracked_modules() names {missing} were never "
                f"applied in the forward pass; found modules: {sorted(specs)}."
            )

    mask = task.get_attention_mask(batch)
    if mask is None:
        return
    linear_rows = {
        name: {int(np.prod(s.shape[:-1])) for s in shapes}
        for name, shapes in out_shapes.items()
        if specs[name].kind == "linear"
    }
    if isinstance(mask, dict):
        unknown = sorted(set(mask) - set(specs))
        if unknown:
            raise IllegalTaskConfigurationError(
                f"get_attention_mask returned masks for unknown modules "
                f"{unknown}; tracked modules are {sorted(specs)}."
            )
        items = mask.items()
    else:
        items = [(None, mask)]
    for name, m in items:
        size = int(np.asarray(m).size)
        candidates = (
            linear_rows.get(name, set())
            if name is not None
            else {r for rows in linear_rows.values() for r in rows}
        )
        if candidates and size not in candidates:
            where = f"module {name!r}" if name is not None else "any tracked linear module"
            raise IllegalTaskConfigurationError(
                f"Attention mask with {size} elements does not match the "
                f"flattened token rows of {where} (candidates: "
                f"{sorted(candidates)}); it would be silently ignored. Masks "
                "must be binary with shape (batch, tokens) matching the "
                "module's activation rows (reference: module/linear.py:33-46)."
            )
