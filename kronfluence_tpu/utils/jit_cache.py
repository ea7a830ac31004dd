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


def cached_value(model: Any, key: Hashable, anchor: Any, builder: Callable[[], Any]) -> Any:
    """Cache keyed on `key` AND the identity of `anchor`.

    Used for device-resident state derived from large host inputs (e.g.
    precondition states derived from loaded factors): partitioned score runs
    invoke the stage driver once per partition with the same factors, and
    re-deriving would re-transfer gigabytes host->device each time. The cache
    holds a strong reference to `anchor`, so its id() cannot be recycled by
    a new object (the stale-id hazard of bare id() keys)."""
    cache = model.__dict__.setdefault("_value_cache", {})
    entry = cache.get(key)
    if entry is not None and entry[0] is anchor:
        return entry[1]
    value = builder()
    cache[key] = (anchor, value)
    return value


def tracked_key(tracked_names) -> Hashable:
    return tuple(sorted(tracked_names)) if tracked_names is not None else None
