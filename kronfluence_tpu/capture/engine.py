"""The capture transform: one vjp yields all per-layer (activation, dy) pairs.

Replaces the reference's entire hook lifecycle (module/tracker/base.py,
tracked_module.py:242-318): a single `jax.vjp` over probe perturbations
produces, for every tracked layer and every use, the input activation and the
gradient of the summed loss w.r.t. the layer output. Downstream stage math
(covariance updates, per-sample gradients, score contractions) consumes these
inside the same jitted computation, so XLA fuses and frees buffers with exact
liveness — no caching hooks, no `no_sync`, no gradient-scale plumbing.
"""

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from kronfluence_tpu.capture.context import CAPTURE, DISCOVER, CaptureContext, activate
from kronfluence_tpu.capture.specs import LayerSpec
from kronfluence_tpu.utils.exceptions import TrackedModuleNotFoundError


@dataclass
class LayerCapture:
    """All captured uses of one tracked layer within a single forward/backward."""

    spec: LayerSpec
    activations: List[jax.Array]  # raw layer inputs, one per use
    output_gradients: List[jax.Array]  # dL/d(layer output), one per use


CaptureResult = Dict[str, LayerCapture]


def discover_specs(
    fn: Callable[[], jax.Array],
    tracked_names: Optional[Sequence[str]] = None,
) -> Tuple[Dict[str, LayerSpec], Dict[str, List[jax.ShapeDtypeStruct]]]:
    """Abstractly evaluates `fn` to find tracked layers and their output avals."""
    ctx = CaptureContext(DISCOVER, tracked_names=tracked_names)
    with activate(ctx):
        jax.eval_shape(fn)
    return ctx.specs, ctx.output_shapes


def capture(
    fn: Callable[[], jax.Array],
    tracked_names: Optional[Sequence[str]] = None,
    require_tracked: bool = True,
    remat: bool = False,
    loss_scale: Optional[float] = None,
) -> Tuple[jax.Array, CaptureResult]:
    """Runs `fn` (a closure returning a scalar summed loss) with capture.

    Returns (loss, {module_name: LayerCapture}). Safe to call inside jit; the
    discovery pass runs abstractly at trace time only.

    With `remat=True` the forward is wrapped in `jax.checkpoint`, so only the
    captured (activation, output-gradient) pairs survive to the backward pass
    and every other intermediate is rematerialized. This is the TPU-native
    replacement for the reference's CPU activation offload
    (module/tracker/factor.py:239): on TPU, recomputing through the MXU is far
    cheaper than round-tripping activations over the host link.

    `loss_scale` implements GradScaler-style loss scaling for float16
    autocast (reference: covariance.py:218-226 + the 1/scale `gradient_scale`
    pushed into hooks, tracked_module.py:272-279): the backward runs with the
    cotangent seeded at `loss_scale` so fp16 gradients avoid underflow, and
    the captured output gradients are unscaled before any factor math.
    """
    specs, out_shapes = discover_specs(fn, tracked_names)
    if require_tracked and not specs:
        raise TrackedModuleNotFoundError(
            "No tracked modules were encountered in the forward pass. Instrument the "
            "model with `prepare_model` (flax) or use `kronfluence_tpu.nn` tagged ops."
        )
    probes = {
        name: [jnp.zeros(s.shape, s.dtype) for s in shapes]
        for name, shapes in out_shapes.items()
    }

    def inner(probes_):
        ctx = CaptureContext(CAPTURE, probes=probes_, tracked_names=tracked_names)
        with activate(ctx):
            out = fn()
        return out, ctx.activations

    if remat:
        inner = jax.checkpoint(inner)

    loss, vjp_fn, activations = jax.vjp(inner, probes, has_aux=True)
    if loss.ndim != 0:
        raise ValueError(f"Loss/measurement must be a scalar; got shape {loss.shape}.")
    seed = jnp.ones((), loss.dtype)
    if loss_scale is not None and loss_scale != 1.0:
        seed = seed * jnp.asarray(loss_scale, loss.dtype)
    (output_gradients,) = vjp_fn(seed)
    inv_scale = (
        1.0 / loss_scale if loss_scale is not None and loss_scale != 1.0 else None
    )
    result: CaptureResult = {}
    for name, spec in specs.items():
        grads = list(output_gradients[name])
        if inv_scale is not None:
            grads = [g * jnp.asarray(inv_scale, g.dtype) for g in grads]
        result[name] = LayerCapture(
            spec=spec,
            activations=activations[name],
            output_gradients=grads,
        )
    return loss, result
