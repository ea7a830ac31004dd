"""Flax linen integration: instrument Dense/Conv layers via method interception.

The functional analogue of the reference's `wrap_tracked_modules`
(kronfluence/module/utils.py:33-106): instead of replacing nn.Linear/nn.Conv2d
instances with TrackedModule wrappers inside a mutable module tree, we wrap
`module.apply` in `flax.linen.intercept_methods` and tap every Dense/Conv
`__call__`. The user's parameter pytree is untouched, so existing checkpoints
load unchanged.

Module names are the linen paths joined with '/', e.g. 'encoder/layers_0/mlp/fc1'.
"""

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax

from kronfluence_tpu.capture.context import current_context
from kronfluence_tpu.capture.specs import LayerSpec


def module_name_of(module: nn.Module) -> str:
    path = getattr(module, "path", None) or ()
    return "/".join(str(p) for p in path) or (module.name or type(module).__name__)


def _normalize_padding(
    padding: Any, num_spatial: int
) -> Union[str, Tuple[Tuple[int, int], ...]]:
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return tuple((padding, padding) for _ in range(num_spatial))
    pads = []
    for p in padding:
        if isinstance(p, int):
            pads.append((p, p))
        else:
            pads.append(tuple(p))
    return tuple(pads)


def _pair(value: Any) -> Tuple[int, int]:
    if value is None:
        return (1, 1)
    if isinstance(value, int):
        return (value, value)
    return tuple(value)


def _dense_spec(module: nn.Dense, x: jax.Array) -> LayerSpec:
    return LayerSpec(
        name=module_name_of(module),
        kind="linear",
        has_bias=module.use_bias,
        in_dim=x.shape[-1],
        out_dim=module.features,
    )


def _is_hf_conv1d(module: nn.Module) -> bool:
    """HuggingFace Flax GPT-2-family `FlaxConv1D` (a dense layer with a
    transposed kernel). The reference forces users to rewrite these modules
    into nn.Linear before analysis (examples/wikitext/pipeline.py:14-20);
    capturing them directly needs no model surgery — only the (input,
    output-gradient) streams matter, not the kernel layout."""
    return (
        type(module).__name__ == "FlaxConv1D"
        and hasattr(module, "features")
        and hasattr(module, "use_bias")
    )


def _hf_conv1d_spec(module: nn.Module, x: jax.Array) -> LayerSpec:
    return LayerSpec(
        name=module_name_of(module),
        kind="linear",
        has_bias=module.use_bias,
        in_dim=x.shape[-1],
        out_dim=module.features,
    )


def _conv_spec(module: nn.Conv, x: jax.Array) -> Optional[LayerSpec]:
    kernel_size = tuple(module.kernel_size)
    if len(kernel_size) != 2 or x.ndim != 4:
        return None  # Only 2D convs have Kronecker-factored support (as reference).
    if getattr(module, "input_dilation", None) not in (None, 1, (1, 1)):
        return None  # Transposed-style convs unsupported.
    groups = module.feature_group_count
    return LayerSpec(
        name=module_name_of(module),
        kind="conv2d",
        has_bias=module.use_bias,
        in_dim=(x.shape[-1] // groups) * kernel_size[0] * kernel_size[1],
        out_dim=module.features,
        kernel_size=kernel_size,
        strides=_pair(module.strides),
        padding=_normalize_padding(module.padding, 2),
        kernel_dilation=_pair(module.kernel_dilation),
        feature_group_count=groups,
    )


def capture_interceptor(next_fun, args, kwargs, context) -> Any:
    """flax.linen interceptor that taps tracked Dense/Conv applications."""
    ctx = current_context()
    if ctx is None or context.method_name != "__call__":
        return next_fun(*args, **kwargs)
    module = context.module
    spec = None
    if isinstance(module, nn.Dense):
        spec = _dense_spec(module, args[0])
    elif isinstance(module, nn.Conv) and not isinstance(module, nn.ConvTranspose):
        spec = _conv_spec(module, args[0])
    elif _is_hf_conv1d(module):
        spec = _hf_conv1d_spec(module, args[0])
    if spec is None or not ctx.is_tracked(spec.name):
        return next_fun(*args, **kwargs)
    x = args[0]
    y = next_fun(*args, **kwargs)
    return ctx.tap(spec, x, y)


def instrumented_apply(module: nn.Module) -> Callable[..., Any]:
    """Returns an apply function that participates in capture when active."""

    def apply_fn(variables, *args, **kwargs):
        with nn.intercept_methods(capture_interceptor):
            return module.apply(variables, *args, **kwargs)

    return apply_fn


def list_tracked_modules(
    module: nn.Module,
    variables: Any,
    *example_args: Any,
    tracked_names: Optional[Sequence[str]] = None,
    **example_kwargs: Any,
) -> dict:
    """Discovers tracked layer specs for a flax model on example inputs."""
    from kronfluence_tpu.capture.engine import discover_specs

    apply_fn = instrumented_apply(module)

    def forward():
        out = apply_fn(variables, *example_args, **example_kwargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.sum().astype(jax.numpy.float32)

    specs, _ = discover_specs(forward, tracked_names)
    return specs
