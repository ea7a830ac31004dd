"""Per-model cache of jitted stage steps.

Stage drivers build their jitted step once per (task, dtypes, tracked set,
mesh, flags) signature and reuse it across calls — without this every
`fit_*`/`compute_*` invocation would define a fresh Python closure and pay a
full XLA recompile (tens of seconds on remote-compile TPU backends)."""

from typing import Any, Callable, Hashable


def cached_step(model: Any, key: Hashable, builder: Callable[[], Any]) -> Any:
    cache = model.__dict__.setdefault("_step_cache", {})
    if key not in cache:
        cache[key] = builder()
    return cache[key]


def tracked_key(tracked_names) -> Hashable:
    return tuple(sorted(tracked_names)) if tracked_names is not None else None
