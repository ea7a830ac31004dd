"""Low-rank compression of preconditioned query gradients.

Replaces `torch.svd_lowrank` / `torch.linalg.svd` in the reference's query
batching (module/tracker/precondition.py:19-52) with a TPU-friendly batched
randomized SVD (Halko et al. 2011): all steps are batched matmuls + QR, which
map onto the MXU, instead of a LAPACK-style iteration.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def lowrank_factors_full(
    gradient: jax.Array, rank: int, out_dtype
) -> Tuple[jax.Array, jax.Array]:
    """Exact truncated SVD: returns (left=(q,o,r), right=(q,r,i))."""
    u, s, vt = jnp.linalg.svd(gradient, full_matrices=False)
    left = u[:, :, :rank] * s[:, None, :rank]
    right = vt[:, :rank, :]
    return left.astype(out_dtype), right.astype(out_dtype)


def lowrank_factors_randomized(
    gradient: jax.Array,
    rank: int,
    out_dtype,
    rng: jax.Array,
    n_iter: int = 2,
    oversample: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Randomized truncated SVD of a batch of matrices (q, o, i).

    Matches torch.svd_lowrank's default behavior (niter=2, Gaussian sketch)
    in expectation; all ops are batched MXU matmuls.
    """
    q_count, o_dim, i_dim = gradient.shape
    k = min(rank + oversample, min(o_dim, i_dim))
    compute_dtype = gradient.dtype
    omega = jax.random.normal(rng, (q_count, i_dim, k), compute_dtype)
    y = jnp.matmul(gradient, omega)  # (q, o, k)
    q_mat, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z = jnp.matmul(gradient.transpose(0, 2, 1), q_mat)  # (q, i, k)
        z, _ = jnp.linalg.qr(z)
        y = jnp.matmul(gradient, z)
        q_mat, _ = jnp.linalg.qr(y)
    b = jnp.matmul(q_mat.transpose(0, 2, 1), gradient)  # (q, k, i)
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    left = jnp.matmul(q_mat, u_b[:, :, :rank]) * s[:, None, :rank]
    right = vt[:, :rank, :]
    return left.astype(out_dtype), right.astype(out_dtype)
