"""Score contractions: the 4-operand einsums at the heart of pairwise scoring.

Reference analogues: TrackedLinear.compute_pairwise_score /
compute_self_measurement_score (module/linear.py:79-138). The reference caches
opt_einsum DP contraction paths and dispatches through torch._VF.einsum;
`jnp.einsum` plans with opt_einsum at trace time and XLA emits fused MXU
contractions, so no path caching is needed.

Notation: q=query, b=train-batch, t=token, o=out_dim, i=in_dim(+1), r=rank.
"""

from typing import Tuple, Union

import jax
import jax.numpy as jnp

PreconditionedGradient = Union[jax.Array, Tuple[jax.Array, jax.Array]]


def pairwise_score(
    preconditioned: PreconditionedGradient,
    a_tok: jax.Array,  # (b, t, i)
    g_tok: jax.Array,  # (b, t, o)
    per_token: bool,
    out_dtype,
) -> jax.Array:
    """score[q, b(, t)] = <P(q), g_b(,t)> without materializing train gradients."""
    if isinstance(preconditioned, tuple):
        left, right = preconditioned  # (q, o, r), (q, r, i)
        if per_token:
            u = jnp.einsum("qor,bto->qbtr", left, g_tok)
            v = jnp.einsum("qri,bti->qbtr", right, a_tok)
            return jnp.sum(u * v, axis=-1).astype(out_dtype)
        return jnp.einsum(
            "qor,qri,bto,bti->qb", left, right, g_tok, a_tok, optimize="optimal"
        ).astype(out_dtype)
    if per_token:
        return jnp.einsum(
            "qoi,bto,bti->qbt", preconditioned, g_tok, a_tok, optimize="optimal"
        ).astype(out_dtype)
    return jnp.einsum(
        "qoi,bto,bti->qb", preconditioned, g_tok, a_tok, optimize="optimal"
    ).astype(out_dtype)


def self_score(
    preconditioned: jax.Array,  # (b, o, i) — preconditioned own gradients
    a_tok: jax.Array,  # (b, t, i)
    g_tok: jax.Array,  # (b, t, o)
    out_dtype,
) -> jax.Array:
    """score[b] = <P(g_b), g_b> (reference: self_score.py:37-61)."""
    return jnp.einsum(
        "boi,bto,bti->b", preconditioned, g_tok, a_tok, optimize="optimal"
    ).astype(out_dtype)
