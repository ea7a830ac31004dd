"""Tagged functional layers for raw-JAX models (no flax required).

Models built from plain functions participate in influence analysis by routing
their dense/conv applications through these ops — the functional counterpart
of the reference's `wrap_tracked_modules` contract that any model whose
forward *calls* a supported module is analyzable
(reference DOCUMENTATION.md:168-181).

Outside a capture context these are plain layer applications with zero
overhead; inside one they record (activation, output-gradient) taps.
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from kronfluence_tpu.capture.context import current_context
from kronfluence_tpu.capture.specs import LayerSpec


def _maybe_tap(spec: LayerSpec, x: jax.Array, y: jax.Array) -> jax.Array:
    ctx = current_context()
    if ctx is None or not ctx.is_tracked(spec.name):
        return y
    return ctx.tap(spec, x, y)


def linear(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    name: str,
) -> jax.Array:
    """Tracked dense layer: `y = x @ kernel + bias`, kernel shape (in, out)."""
    y = jnp.matmul(x, kernel)
    if bias is not None:
        y = y + bias
    spec = LayerSpec(
        name=name,
        kind="linear",
        has_bias=bias is not None,
        in_dim=kernel.shape[0],
        out_dim=kernel.shape[1],
    )
    return _maybe_tap(spec, x, y)


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    name: str,
    strides: Union[int, Tuple[int, int]] = 1,
    padding: Union[str, Tuple[Tuple[int, int], ...]] = "SAME",
    kernel_dilation: Union[int, Tuple[int, int]] = 1,
    feature_group_count: int = 1,
) -> jax.Array:
    """Tracked 2D convolution, NHWC input, HWIO kernel (TPU-native layouts)."""
    strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
    kernel_dilation = (
        (kernel_dilation, kernel_dilation)
        if isinstance(kernel_dilation, int)
        else tuple(kernel_dilation)
    )
    kh, kw, in_per_group, out_ch = kernel.shape
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        rhs_dilation=kernel_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if bias is not None:
        y = y + bias
    spec = LayerSpec(
        name=name,
        kind="conv2d",
        has_bias=bias is not None,
        in_dim=in_per_group * kh * kw,
        out_dim=out_ch,
        kernel_size=(kh, kw),
        strides=strides,
        padding=padding if isinstance(padding, str) else tuple(map(tuple, padding)),
        kernel_dilation=kernel_dilation,
        feature_group_count=feature_group_count,
    )
    return _maybe_tap(spec, x, y)


def scan_layers(
    body_fn,
    init,
    xs,
    name_format: str = "layer_{i}",
    remat: bool = False,
):
    """Capture-aware `lax.scan` over stacked layer parameters.

    The TPU-native answer to SURVEY.md section 7 "Hard parts": real flax/JAX
    LMs scan one block over a stacked (L, ...) parameter pytree instead of
    unrolling L blocks, but a plain `lax.scan` hides per-layer activations
    from the capture context (the body is traced once; its tracers cannot be
    collected into host-side lists). `scan_layers` runs the same scan while
    threading capture through it:

      * tracked layers inside `body_fn` are discovered once;
      * their output-gradient probes are stacked over the layer axis and fed
        through the scan's `xs`, so one vjp still yields every layer's dy;
      * per-iteration activations come back as stacked scan outputs and are
        registered with the parent context under per-layer names
        `f"{name_format.format(i=i)}/{inner_name}"` — identical to the names
        an unrolled model would produce, so factors match layer-for-layer.

    Args:
        body_fn: `(carry, x) -> (carry, y)`; per-layer parameters ride in `x`.
        init: initial carry.
        xs: pytree with leading layer axis L (stacked per-layer params/inputs).
        name_format: format string (field `i`) prefixed to tracked-module
            names inside the body.

    Returns:
        `(final_carry, stacked_ys)` exactly like `jax.lax.scan`.

    Outside a capture context this is a plain `lax.scan` with zero overhead.
    """
    from kronfluence_tpu.capture.context import CAPTURE, CaptureContext, activate

    ctx = current_context()
    if ctx is None:
        body = jax.checkpoint(body_fn) if remat else body_fn
        return jax.lax.scan(body, init, xs)

    length = jax.tree_util.tree_leaves(xs)[0].shape[0]

    def layer_name(i: int, inner: str) -> str:
        return f"{name_format.format(i=i)}/{inner}"

    # Discovery pass on layer 0 (abstract): find tracked layers in the body.
    sub_discover = CaptureContext("discover")
    x0 = jax.tree_util.tree_map(lambda a: a[0], xs)

    def probe_body(carry_and_x):
        carry, x = carry_and_x
        with activate(sub_discover):
            return body_fn(carry, x)

    jax.eval_shape(probe_body, (init, x0))
    inner_specs = sub_discover.specs
    inner_shapes = sub_discover.output_shapes

    tracked_inner = {
        inner: spec
        for inner, spec in inner_specs.items()
        if ctx.is_tracked(layer_name(0, inner))
    }

    if ctx.mode == "discover":
        for inner, spec in tracked_inner.items():
            for i in range(length):
                named = layer_name(i, inner)
                ctx.specs[named] = LayerSpec(**{**spec.__dict__, "name": named})
                ctx.output_shapes[named] = list(inner_shapes[inner])
        from kronfluence_tpu.capture.context import suppress

        with suppress():  # body taps must not leak unprefixed names
            return jax.lax.scan(body_fn, init, xs)

    # Capture mode: stack this module's per-layer probes along a new axis and
    # ride them through the scan's xs so the vjp differentiates through them.
    probes_stacked = {}
    for inner in tracked_inner:
        uses = len(inner_shapes[inner])
        start = ctx._use_idx.get(layer_name(0, inner), 0)
        probes_stacked[inner] = [
            jnp.stack(
                [ctx.probes[layer_name(i, inner)][start + u] for i in range(length)]
            )
            for u in range(uses)
        ]

    def wrapped_body(carry, x_and_probes):
        x, probe_slices = x_and_probes

        def inner(carry, x, probe_slices):
            sub = CaptureContext(CAPTURE, probes=probe_slices,
                                 tracked_names=list(tracked_inner))
            with activate(sub):
                carry, y = body_fn(carry, x)
            return carry, y, sub.activations

        if remat:
            # Per-block gradient checkpointing INSIDE the scan: only the block
            # inputs and the tapped activations (which influence analysis needs
            # anyway) are saved across the forward scan; attention internals
            # (probs, qkv) rematerialize in the backward scan. Without this, a
            # deep model's backward-of-scan holds every layer's attention
            # weights live at once (the 12-layer GPT-2 lambda step exceeds a
            # v5e's 16 GB HBM at batch 32).
            inner = jax.checkpoint(inner)
        carry, y, acts = inner(carry, x, probe_slices)
        return carry, (y, acts)

    carry, (ys, acts) = jax.lax.scan(wrapped_body, init, (xs, probes_stacked))

    # Register stacked activations under per-layer names; consume probe uses.
    for inner in tracked_inner:
        for i in range(length):
            named = layer_name(i, inner)
            ctx.specs[named] = LayerSpec(**{**inner_specs[inner].__dict__, "name": named})
            ctx.activations.setdefault(named, []).extend(use[i] for use in acts[inner])
            ctx._use_idx[named] = ctx._use_idx.get(named, 0) + len(acts[inner])
    return carry, ys


def checkpoint_block(fn, *args, policy=None):
    """Capture-aware `jax.checkpoint`: rematerialized block with working taps.

    A plain in-model `jax.checkpoint`/`nn.remat` cannot host capture taps:
    the checkpoint's body is traced into a cached sub-jaxpr, so (a) the
    Python taps do not re-run on later traces (jaxpr cache keyed on the
    function object) and (b) activation tracers collected from the sub-trace
    leak. `checkpoint_block` solves both by making the tapped activations
    explicit checkpoint OUTPUTS (they must be saved anyway — they are what
    influence analysis consumes) while everything else in `fn`
    rematerializes. Use it for per-block gradient checkpointing; for
    whole-model rematerialization prefer
    `FactorArguments.offload_activations_to_cpu` (engine-level remat).

    Outside a capture context this is exactly `jax.checkpoint(fn)(*args)`.
    """
    from kronfluence_tpu.capture.context import (
        CAPTURE,
        CaptureContext,
        activate,
        suppress,
    )

    ctx = current_context()
    if ctx is None:
        return jax.checkpoint(fn, policy=policy)(*args)

    sub_discover = CaptureContext("discover")

    def probe(args_):
        with activate(sub_discover):
            return fn(*args_)

    jax.eval_shape(probe, args)
    tracked = {
        name: spec
        for name, spec in sub_discover.specs.items()
        if ctx.is_tracked(name)
    }

    if ctx.mode == "discover":
        for name, spec in tracked.items():
            ctx.specs[name] = spec
            ctx.output_shapes.setdefault(name, []).extend(
                sub_discover.output_shapes[name]
            )
        with suppress():
            return jax.checkpoint(fn, policy=policy)(*args)

    # Consume this call's probe slots (a block may be applied several times).
    starts = {}
    probes_subset = {}
    for name in tracked:
        uses = len(sub_discover.output_shapes[name])
        start = ctx._use_idx.get(name, 0)
        starts[name] = start
        probes_subset[name] = list(ctx.probes[name][start : start + uses])
        ctx._use_idx[name] = start + uses

    def inner_fn(args_, probes_):
        sub = CaptureContext(CAPTURE, probes=probes_, tracked_names=list(tracked))
        with activate(sub):
            y = fn(*args_)
        return y, sub.activations

    y, acts = jax.checkpoint(inner_fn, policy=policy)(args, probes_subset)
    for name, spec in tracked.items():
        ctx.specs[name] = spec
        ctx.activations.setdefault(name, []).extend(acts[name])
    return y
