"""dtype plumbing: user-facing dtype specs are strings or jnp dtypes.

The reference uses `torch.dtype` objects in its argument dataclasses and
serializes them via `str()` (reference: arguments.py:12-23). We accept strings
("float32", "bfloat16", ...), numpy dtypes, or jax dtypes everywhere and
normalize to a canonical string for JSON round-tripping.
"""

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

_CANONICAL = {
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float64": jnp.float64,
    # Storage-only formats for query-gradient blocks (ops/quantize.py); the
    # reference has no analogue (torch fp8 postdates it).
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
    "int32": jnp.int32,
    "int64": jnp.int64,
}

# Accept reference-style serialized names for artifact compatibility.
_ALIASES = {
    "torch.float16": "float16",
    "torch.bfloat16": "bfloat16",
    "torch.float32": "float32",
    "torch.float64": "float64",
    "torch.int32": "int32",
    "torch.int64": "int64",
    "half": "float16",
    "float": "float32",
    "double": "float64",
}


def canonical_dtype_name(dtype: Any) -> Optional[str]:
    """Normalizes a dtype spec to a canonical string name (or None)."""
    if dtype is None:
        return None
    if isinstance(dtype, str):
        name = _ALIASES.get(dtype, dtype)
    else:
        name = np.dtype(dtype).name
    if name not in _CANONICAL:
        raise ValueError(f"Unsupported dtype spec: {dtype!r}")
    return name


def resolve_dtype(dtype: Any) -> Any:
    """Resolves a dtype spec to a jnp dtype (or None)."""
    name = canonical_dtype_name(dtype)
    return None if name is None else _CANONICAL[name]


def accumulation_dtype(dtype: Any) -> Any:
    """Running-sum dtype for a given per-batch compute dtype.

    Low-precision inputs (bf16/fp16) accumulate into float32 — on TPU the MXU
    natively emits float32 partials from bfloat16 operands, so this is both
    faster and strictly more accurate than the reference's same-dtype
    `addmm_` accumulation.
    """
    d = resolve_dtype(dtype)
    if d in (jnp.bfloat16, jnp.float16):
        return jnp.float32
    return d
