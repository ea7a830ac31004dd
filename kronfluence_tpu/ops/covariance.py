"""Covariance accumulation math (MXU rank-k updates).

The reference accumulates `A^T A` / `G^T G` via `torch.addmm_`
(kronfluence/module/tracker/factor.py:58,93). Here each batch contributes a
single `dot_general` with `preferred_element_type` set to the accumulator
dtype, so bf16 operands accumulate in float32 on the MXU — faster *and* more
accurate than the reference's in-dtype accumulation.
"""

import jax
import jax.numpy as jnp


def gram(flat: jax.Array, accum_dtype) -> jax.Array:
    """Returns `flat^T @ flat` with the requested accumulation dtype."""
    return jax.lax.dot_general(
        flat,
        flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    )


def per_sample_gradient(
    activation_tokens: jax.Array,  # (batch, tokens, in_dim[+1])
    gradient_tokens: jax.Array,  # (batch, tokens, out_dim)
    accum_dtype,
) -> jax.Array:
    """Per-sample weight gradients, shape (batch, out_dim, in_dim[+1]).

    Matches reference `compute_per_sample_gradient`
    (linear.py:70-77: einsum('b...i,b...o->bio')), with the summed-over-token
    contraction on the MXU.
    """
    return jnp.einsum(
        "bto,bti->boi",
        gradient_tokens,
        activation_tokens,
        preferred_element_type=accum_dtype,
    )


def summed_gradient(
    activation_tokens: jax.Array,
    gradient_tokens: jax.Array,
    accum_dtype,
) -> jax.Array:
    """Batch-summed weight gradient, shape (out_dim, in_dim[+1])."""
    return jnp.einsum(
        "bto,bti->oi",
        gradient_tokens,
        activation_tokens,
        preferred_element_type=accum_dtype,
    )
