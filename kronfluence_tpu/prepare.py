"""Model preparation: the JAX analogue of the reference's `prepare_model`.

`prepare_model(model, task)` (reference: analyzer.py:20-45) freezes parameters
and installs TrackedModule wrappers. In the functional world parameters are
immutable by construction, so preparation reduces to building an instrumented
apply function. Supported model forms:

  * flax linen `nn.Module` — instrumented via method interception; the user's
    parameter pytree is unchanged.
  * plain callable `apply_fn(params, *args, **kwargs)` — must route tracked
    layers through `kronfluence_tpu.nn` tagged ops.
"""

from typing import Any, Callable, Optional, Sequence

try:
    import flax.linen as nn

    _HAS_FLAX = True
except ImportError:  # pragma: no cover
    _HAS_FLAX = False

from kronfluence_tpu.capture.specs import LayerSpec
from kronfluence_tpu.task import Task


class BoundModel:
    """A model handle bound to concrete parameters; call it like the forward fn."""

    def __init__(self, apply_fn: Callable[..., Any], params: Any) -> None:
        self._apply_fn = apply_fn
        self._params = params

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self._apply_fn(self._params, *args, **kwargs)

    @property
    def params(self) -> Any:
        return self._params


class PreparedModel:
    """An analyzable model: instrumented apply function + tracked-name filter."""

    def __init__(
        self,
        apply_fn: Callable[..., Any],
        tracked_names: Optional[Sequence[str]] = None,
        module: Any = None,
    ) -> None:
        self.apply_fn = apply_fn
        self.tracked_names = list(tracked_names) if tracked_names is not None else None
        self.module = module
        self._task_tokens: dict = {}

    def bind(self, params: Any) -> BoundModel:
        return BoundModel(self.apply_fn, params)

    def task_key(self, task: Any) -> int:
        """Stable jit-cache token for a task instance.

        `id(task)` alone is unsafe: ids of garbage-collected objects are
        reused, which could hand a new task a stale compiled step. Keeping a
        strong reference per token pins the id for the model's lifetime.
        """
        token = id(task)
        self._task_tokens[token] = task
        return token

    def discover(self, params: Any, *example_args: Any, **example_kwargs: Any):
        """Returns {name: LayerSpec} for tracked layers on example inputs."""
        import jax
        import jax.numpy as jnp

        from kronfluence_tpu.capture.engine import discover_specs

        def forward():
            out = self.apply_fn(params, *example_args, **example_kwargs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32)

        specs, _ = discover_specs(forward, self.tracked_names)
        return specs


def _flax_apply_fn(module: "nn.Module") -> Callable[..., Any]:
    from kronfluence_tpu.capture.flax_integration import instrumented_apply

    raw_apply = instrumented_apply(module)

    def apply_fn(params, *args, **kwargs):
        variables = params if isinstance(params, dict) and "params" in params else {"params": params}
        return raw_apply(variables, *args, **kwargs)

    return apply_fn


def prepare_model(model: Any, task: Optional[Task] = None) -> PreparedModel:
    """Prepares a model for influence analysis.

    Args:
        model: A flax linen Module, a plain apply function
            `f(params, *args, **kwargs)`, or an existing PreparedModel.
        task: Optional Task whose `get_influence_tracked_modules()` filters
            which layers are tracked.

    Returns:
        PreparedModel usable with `Analyzer`.
    """
    tracked = task.get_influence_tracked_modules() if task is not None else None
    if isinstance(model, PreparedModel):
        if tracked is not None:
            model.tracked_names = list(tracked)
        return model
    if _HAS_FLAX and isinstance(model, nn.Module):
        return PreparedModel(_flax_apply_fn(model), tracked_names=tracked, module=model)
    if callable(model):
        return PreparedModel(model, tracked_names=tracked)
    raise TypeError(
        f"Cannot prepare model of type {type(model)}: expected a flax Module or an "
        "apply function f(params, *args, **kwargs)."
    )
