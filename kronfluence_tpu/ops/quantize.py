"""Scaled low-precision storage for preconditioned query gradients.

The pairwise score stage holds one *block* of preconditioned query gradients
resident in HBM for an entire pass over the train loader (reference loop
nest: kronfluence/score/pairwise.py:217-280 — the train loader is re-iterated
once per accumulated query block). That block is the largest resident of the
whole stage: for GPT-2 it is ~170 MB/query in bf16, which caps the block at
~56 queries on a 16 GB chip and forces ceil(481/56) = 9 full train passes.

Storing the block in float8 with one scale per (query, module) halves the
footprint — about twice the queries fit per block, so the train-side
forward/backward (the dominant cost; it is repeated per block) runs half as
often. Compute stays bf16/fp32: blocks are dequantized per-module right
before the score contraction, so only one module's dense block is transiently
materialized.

This is a storage-precision knob layered on top of the reference's bf16
recipe (`ScoreArguments.query_gradient_storage_dtype`, default off). The
bench's fidelity mode measures its score correlation against fp32 the same
way the reference certifies bf16 (examples/wikitext/README.md:97).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Per-format (clip bound, scale target): values are scaled so the per-(query,
# module) max-abs lands at `target`, then clipped to the finite max before the
# cast. For the narrow-range fp8 formats the target IS the finite max (every
# exponent bit counts); for bf16/fp16 the target sits well inside the range —
# mapping amax to the format max would need scales near amax/3.4e38, which
# UNDERFLOW fp32 for ordinary gradient magnitudes (scale -> 0 -> the whole
# block dequantizes to 0). Precision of float formats is scale-invariant, so
# only dynamic-range placement matters.
_FORMAT = {
    jnp.dtype(jnp.float8_e4m3fn): (448.0, 448.0),
    jnp.dtype(jnp.float8_e5m2): (57344.0, 57344.0),
    jnp.dtype(jnp.bfloat16): (float(jnp.finfo(jnp.bfloat16).max), 1.0),
    jnp.dtype(jnp.float16): (float(jnp.finfo(jnp.float16).max), 256.0),
}
# Scales below fp32's min normal lose precision (and can round to 0).
_MIN_SCALE = float(np.finfo(np.float32).tiny)

STORAGE_DTYPES = tuple(sorted(str(d) for d in _FORMAT))


@jax.tree_util.register_pytree_node_class
class QuantizedGradient:
    """A (q, o, i) gradient block stored as `data * scale`.

    `data` is the low-precision payload; `scale` is one fp32 factor per query
    (shape (q, 1, 1)) chosen so each query's max-abs maps to the format's max
    finite value. Registered as a pytree so blocks flow through jit arguments
    and shardings like plain arrays.
    """

    def __init__(self, data: jax.Array, scale: jax.Array):
        self.data = data
        self.scale = scale

    def dequantize(self, dtype) -> jax.Array:
        return self.data.astype(dtype) * self.scale.astype(dtype)

    @property
    def shape(self):
        return self.data.shape

    def tree_flatten(self):
        return (self.data, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def quantize_gradient(psg: jax.Array, storage_dtype) -> QuantizedGradient:
    """Quantizes a (q, o, i) block with one scale per query.

    Zero gradients get scale 1 (payload stays zero). The scale divides on the
    way in and multiplies on the way out, so the stored payload spans the
    format's full dynamic range regardless of the gradients' magnitude.
    """
    dt = jnp.dtype(storage_dtype)
    fmax, target = _FORMAT[dt]
    amax = jnp.max(jnp.abs(psg), axis=tuple(range(1, psg.ndim)), keepdims=True)
    scale = jnp.where(amax > 0, jnp.maximum(amax / target, _MIN_SCALE), 1.0)
    scale = scale.astype(jnp.float32)
    # The fp32-rounded scale can leave `psg / scale` a hair above fmax, which
    # the cast would turn into inf (or NaN for the inf-less e4m3fn); clip to
    # the finite range first.
    data = jnp.clip(psg / scale.astype(psg.dtype), -fmax, fmax).astype(dt)
    return QuantizedGradient(data, scale)


def dequantize_gradient(pg: Any, dtype) -> Any:
    """Dequantizes if `pg` is a QuantizedGradient; otherwise returns as-is."""
    if isinstance(pg, QuantizedGradient):
        return pg.dequantize(dtype)
    return pg


def concat_quantized(chunks) -> QuantizedGradient:
    """Concatenates quantized chunks along the query axis, staying quantized.

    Each chunk keeps its own per-query scales, so the merge is exact — no
    requantization. The transient peak is 2x ONE module's low-precision
    payload (vs 2x the dense block for concatenating dequantized chunks),
    which is why the score driver merges quantized blocks but keeps dense
    bf16 chunks separate: merging turns the train step's per-chunk thin
    (q_chunk, b) contractions into one full-block GEMM per module."""
    return QuantizedGradient(
        jnp.concatenate([c.data for c in chunks], axis=0),
        jnp.concatenate([c.scale for c in chunks], axis=0),
    )
