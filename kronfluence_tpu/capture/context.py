"""Trace-time capture context.

This replaces the reference's hook-based TrackedModule machinery
(kronfluence/module/tracked_module.py, module/tracker/*). Instead of mutating
an nn.Module tree and registering forward/backward hooks, tracked layer calls
"tap" into a thread-local context while JAX traces the user's loss function:

  * discover mode — records each tracked layer's LayerSpec and output aval so
    probe arrays can be allocated (runs under `jax.eval_shape`, zero FLOPs).
  * capture mode — records the input activation tracer and adds a zero-valued
    probe to the layer output; differentiating the loss w.r.t. the probes
    yields the per-layer output gradients. This is the functional analogue of
    the reference's `_constant` zero-parameter hack (tracked_module.py:97-103)
    that keeps backward hooks firing for frozen models.

All side effects happen at trace time only; the traced computation stays pure,
so capture composes with jit, shard_map, remat, and mesh sharding.
"""

import contextlib
import threading
from typing import Dict, List, Optional, Sequence

import jax

from kronfluence_tpu.capture.specs import LayerSpec

_tls = threading.local()

DISCOVER = "discover"
CAPTURE = "capture"


class CaptureContext:
    """Thread-local registry active while tracing an instrumented forward."""

    def __init__(
        self,
        mode: str,
        probes: Optional[Dict[str, List[jax.Array]]] = None,
        tracked_names: Optional[Sequence[str]] = None,
    ) -> None:
        assert mode in (DISCOVER, CAPTURE)
        self.mode = mode
        self.probes = probes or {}
        self.tracked_names = set(tracked_names) if tracked_names is not None else None
        # Per-layer records. Lists hold one entry per *use* of the layer in
        # the forward pass (shared parameters => len > 1; reference analogue:
        # tracker/base.py shared-parameter accumulation).
        self.specs: Dict[str, LayerSpec] = {}
        self.activations: Dict[str, List[jax.Array]] = {}
        self.output_shapes: Dict[str, List[jax.ShapeDtypeStruct]] = {}
        self._use_idx: Dict[str, int] = {}

    def is_tracked(self, name: str) -> bool:
        return self.tracked_names is None or name in self.tracked_names

    def tap(self, spec: LayerSpec, x: jax.Array, y: jax.Array) -> jax.Array:
        """Records one tracked layer application; returns (possibly probed) y."""
        name = spec.name
        prev = self.specs.get(name)
        if prev is not None and prev != spec:
            raise ValueError(
                f"Tracked module {name!r} used with inconsistent specs: {prev} vs {spec}."
            )
        self.specs[name] = spec
        self.activations.setdefault(name, []).append(x)
        if self.mode == DISCOVER:
            self.output_shapes.setdefault(name, []).append(
                jax.ShapeDtypeStruct(y.shape, y.dtype)
            )
            return y
        idx = self._use_idx.get(name, 0)
        self._use_idx[name] = idx + 1
        probe_list = self.probes.get(name)
        if probe_list is None or idx >= len(probe_list):
            raise RuntimeError(
                f"Capture probe missing for module {name!r} use #{idx}: the forward "
                "pass is not deterministic between the discovery and capture traces."
            )
        return y + probe_list[idx]


def current_context() -> Optional[CaptureContext]:
    return getattr(_tls, "ctx", None)


@contextlib.contextmanager
def activate(ctx: CaptureContext):
    prev = getattr(_tls, "ctx", None)
    _tls.ctx = ctx
    try:
        yield ctx
    finally:
        _tls.ctx = prev


@contextlib.contextmanager
def suppress():
    """Temporarily disables capture (taps pass through untouched)."""
    prev = getattr(_tls, "ctx", None)
    _tls.ctx = None
    try:
        yield
    finally:
        _tls.ctx = prev
