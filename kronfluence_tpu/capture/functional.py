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
