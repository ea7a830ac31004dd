"""TPU-native batched spectral divide-and-conquer eigensolver.

Replaces XLA's built-in QDWH eigh (the reference's cuSOLVER `syevd` role,
kronfluence/factor/eigen.py:199-210) for the production fp32 path. XLA's
implementation solves each matrix of a batch SEQUENTIALLY (`lax.map`, see
jax._src.tpu.linalg.eigh) with a QR-heavy QDWH polar step and a data-dependent
agenda, leaving the MXU mostly idle and compiling for minutes per shape. This
module restructures the same Nakatsukasa-Higham spectral divide-and-conquer
(SIAM Rev. 2013) to be TPU-shaped:

  * The recursion is driven from the HOST, level-synchronously: subproblems of
    one dimension group are padded into shared static-shape buckets and every
    expensive device step runs BATCHED over all matrices and siblings at once.
    Only the (tiny) subspace ranks are fetched between levels.
  * The spectral projector is computed with a scaled Newton-Schulz sign
    iteration - pure batched symmetric matmuls on the MXU (no QR, no
    triangular solves in the hot loop), with a host-precomputed optimal
    scaling schedule.
  * Invariant-subspace bases come from two rounds of CholeskyQR on a
    projector-interleaved column selection - batched matmuls + one small
    Cholesky, instead of column-pivoted Householder QR.
  * Dimension padding is EXACT: padded diagonal entries sort above the true
    spectrum (Gershgorin bound) and are sliced off, so near-miss dims and
    uneven children share programs (same trick as factor/eigen.py group
    merging).
  * Leaves are solved by the batched blocked-Jacobi solver (ops/eigh.py),
    which is fast to compile and accurate for small blocks.

Per-problem robustness fallbacks (split retries at different quantiles,
rejection of non-converged sign iterations) are plain host Python - one more
advantage of keeping the recursion off the device.
"""

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

LEAF_SIZE = 256  # blocked-Jacobi leaf (2 x block_size 128); compile-cheap
_BUCKET_GRAN = 256  # child bucket sizes are multiples of this
_SIGN_L0 = 1e-6  # assumed lower bound on |lambda|/||B|| at the split point


def _round_up(value: int, gran: int) -> int:
    return -(-value // gran) * gran


# ---------------------------------------------------------------------------
# Scaled Newton-Schulz sign iteration schedule (host-side, computed once).
# Each iteration applies g(x) = 0.5 * mu * x * (3 - mu^2 x^2), the optimally
# scaled degree-3 polynomial mapping [l, 1] -> [l', 1] with l' maximized
# subject to |g| <= 1 on [0, 1] (mu <= sqrt(3) keeps g nonnegative).
# ---------------------------------------------------------------------------


def _sign_schedule(l0: float = _SIGN_L0, max_iters: int = 48) -> np.ndarray:
    mus = []
    l = float(l0)
    xs = np.linspace(0.0, 1.0, 2049)[1:]
    for _ in range(max_iters):
        if l > 0.9999:
            break
        best_mu, best_l = 1.0, 0.0
        for mu in np.linspace(1.0, math.sqrt(3.0) - 1e-3, 200):
            y = mu * xs
            g = 0.5 * y * (3.0 - y * y)
            lo = mu * l
            glo = 0.5 * lo * (3.0 - lo * lo)
            gmax = float(g.max())
            if gmax > 1.0 + 1e-9:
                continue
            # g is increasing then decreasing on [0, sqrt(3)]; min over
            # [l, 1] is at an endpoint.
            gend = 0.5 * mu * (3.0 - mu * mu)
            gmin = min(glo, gend)
            if gmin > best_l:
                best_l, best_mu = gmin, mu
        mus.append(best_mu)
        l = best_l
    # Refinement: plain Newton-Schulz (mu = 1) is quadratically convergent
    # near the fixed point +-1.
    mus.extend([1.0, 1.0])
    return np.asarray(mus, np.float32)


_SCHEDULE = None


def _get_schedule() -> np.ndarray:
    global _SCHEDULE
    if _SCHEDULE is None:
        _SCHEDULE = _sign_schedule()
    return _SCHEDULE


# ---------------------------------------------------------------------------
# Device programs (jitted per static bucket shape).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("num_iters",))
def _split_bucket(H, m_true, quantile, mus, num_iters: int):
    """One spectral split, batched over a (k, m, m) bucket.

    Args:
        H: (k, m, m) fp32 symmetric; rows/cols >= m_true hold exact
            big-diagonal padding (sorts above the true spectrum).
        m_true: (k,) int32 true dimensions.
        quantile: (k,) fp32 in (0, 1) - which sorted-diagonal quantile to
            split at (host retries with different quantiles on failure).
        mus: (num_iters,) fp32 Newton-Schulz scaling schedule.

    Returns:
        Hc: (k, m, m) rotated matrix (block-diagonal up to sign error),
        Q: (k, m, m) orthogonal,
        rank: (k,) int32 size of the "minus" (lower-spectrum) block,
        quality: (k,) fp32 - distance of the sign iterate from an involution
            (||U^2 - I||_F / sqrt(m)); large values flag failed splits.
    """
    k, m, _ = H.shape
    hiprec = jax.lax.Precision.HIGHEST
    loprec = jax.lax.Precision.HIGH
    idx = jnp.arange(m)
    valid = idx[None, :] < m_true[:, None]  # (k, m)

    # ---- split point: gap-refined quantile of the sorted diagonal ----
    d = jnp.where(valid, jnp.diagonal(H, axis1=1, axis2=2), jnp.inf)
    d_sorted = jnp.sort(d, axis=1)  # pads (inf) last
    pos = jnp.clip((quantile * m_true.astype(jnp.float32)).astype(jnp.int32),
                   1, jnp.maximum(m_true - 1, 1))
    # Largest diagonal gap within +-m/8 of the quantile position: splitting
    # inside an eigenvalue cluster stalls the sign iteration.
    gaps = d_sorted[:, 1:] - d_sorted[:, :-1]  # (k, m-1)
    window = jnp.abs(idx[None, : m - 1] + 1 - pos[:, None]) <= jnp.maximum(
        m_true[:, None] // 8, 1
    )
    in_range = (idx[None, : m - 1] + 1 < m_true[:, None]) & (
        idx[None, : m - 1] + 1 > 0
    )
    gaps = jnp.where(window & in_range & jnp.isfinite(gaps), gaps, -jnp.inf)
    gap_pos = jnp.argmax(gaps, axis=1) + 1  # split BELOW this sorted index
    lo = jnp.take_along_axis(d_sorted, gap_pos[:, None] - 1, axis=1)[:, 0]
    hi = jnp.take_along_axis(d_sorted, gap_pos[:, None], axis=1)[:, 0]
    sigma = 0.5 * (lo + hi)

    # ---- scaled Newton-Schulz sign iteration ----
    B = H - sigma[:, None, None] * jnp.eye(m, dtype=H.dtype)
    # 2-norm upper estimate: a few power iterations (cheap, latency-bound).
    v = jnp.full((k, m, 1), 1.0 / math.sqrt(m), H.dtype)
    for _ in range(8):
        v = jnp.matmul(B, v, precision=loprec)
        v = v / (jnp.linalg.norm(v, axis=(1, 2), keepdims=True) + 1e-30)
    Bv = jnp.matmul(B, v, precision=hiprec)
    alpha = 1.05 * jnp.linalg.norm(Bv, axis=(1, 2)) + 1e-30
    X = B / alpha[:, None, None]

    def body(i, X):
        mu = mus[i]
        Y = mu * X
        Y2 = jnp.matmul(Y, Y, precision=loprec)
        return 1.5 * Y - 0.5 * jnp.matmul(Y2, Y, precision=loprec)

    X = jax.lax.fori_loop(0, num_iters - 2, body, X)
    # Final refinement steps at full fp32 accumulation.
    for _ in range(2):
        X2 = jnp.matmul(X, X, precision=hiprec)
        X = 1.5 * X - 0.5 * jnp.matmul(X2, X, precision=hiprec)
    U = 0.5 * (X + X.transpose(0, 2, 1))

    U2 = jnp.matmul(U, U, precision=hiprec)
    eye = jnp.eye(m, dtype=H.dtype)
    # Convergence quality over the TRUE block only (pads are exact).
    mask2d = valid[:, :, None] & valid[:, None, :]
    quality = jnp.sqrt(
        jnp.sum(jnp.square((U2 - eye) * mask2d), axis=(1, 2))
    ) / jnp.sqrt(m_true.astype(H.dtype))

    # ---- projector & rank ----
    P = 0.5 * (eye - U)
    P = jnp.where(mask2d, P, 0.0)  # pads: exactly in the plus subspace
    rank = jnp.round(jnp.trace(P, axis1=1, axis2=2)).astype(jnp.int32)

    # ---- interleaved basis: CholeskyQR^2 ----
    # Columns sorted by projector column norm (descending); the first `rank`
    # positions take columns of P (spanning range(P)), the rest take columns
    # of (I - P). The two ranges are orthogonal complements, so the combined
    # matrix is full rank and one QR yields both bases, without the dynamic
    # shapes of a rank-sliced QR.
    Pc = eye - P  # complement projector (pads: identity columns)
    colnorm = jnp.sum(P * P, axis=1)  # (k, m)
    order = jnp.argsort(-colnorm, axis=1)
    take = jnp.take_along_axis
    mask_r = (idx[None, :] < rank[:, None]).astype(H.dtype)  # (k, m)
    C = take(P, order[:, None, :], axis=2) * mask_r[:, None, :] + take(
        Pc, order[:, None, :], axis=2
    ) * (1.0 - mask_r[:, None, :])

    def cholqr(C, jitter):
        G = jnp.matmul(C.transpose(0, 2, 1), C, precision=hiprec)
        G = G + jitter * jnp.eye(m, dtype=H.dtype)
        L = jnp.linalg.cholesky(G)
        # Solve Q L^T = C  ->  Q = C L^-T  (batched triangular solve).
        return jax.lax.linalg.triangular_solve(
            L, C, left_side=False, lower=True, transpose_a=True
        )

    Q = cholqr(C, jitter=jnp.asarray(1e-6, H.dtype))
    Q = cholqr(Q, jitter=jnp.asarray(0.0, H.dtype))

    Hc = jnp.matmul(
        jnp.matmul(Q.transpose(0, 2, 1), H, precision=hiprec), Q, precision=hiprec
    )
    Hc = 0.5 * (Hc + Hc.transpose(0, 2, 1))
    return Hc, Q, rank, quality


@partial(jax.jit, static_argnames=("m_child", "minus"))
def _extract_child(Hc, VQ, rank, m_true, m_child: int, minus: bool):
    """Extracts the (minus|plus) diagonal block of a rotated matrix into a
    `m_child`-padded child problem, and the matching isometry columns.

    Returns (H_child (k, m_child, m_child), V_child (k, n, m_child),
    m_true_child (k,)).
    """
    k, m, _ = Hc.shape
    if minus:
        start = jnp.zeros_like(rank)
        size = rank
    else:
        start = rank
        size = m_true - rank
    # Roll the wanted block to the origin (dynamic start, static slice).
    Hr = jax.vmap(lambda A, s: jnp.roll(A, shift=(-s, -s), axis=(0, 1)))(Hc, start)
    Hr = Hr[:, :m_child, :m_child]
    idx = jnp.arange(m_child)
    valid = idx[None, :] < size[:, None]
    mask2d = valid[:, :, None] & valid[:, None, :]
    # Exact padding: big diagonal sorts above the child's spectrum.
    bound = jnp.max(
        jnp.sum(jnp.abs(Hr) * mask2d, axis=2), axis=1
    )
    pad_val = 4.0 * bound + 1.0
    eye = jnp.eye(m_child, dtype=Hc.dtype)
    Hr = jnp.where(mask2d, Hr, pad_val[:, None, None] * eye)
    Vr = jax.vmap(lambda A, s: jnp.roll(A, shift=-s, axis=1))(VQ, start)
    Vr = Vr[:, :, :m_child] * valid[:, None, :]
    return Hr, Vr, size


@jax.jit
def _compose_v(V, Q):
    return jnp.matmul(V, Q, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("n",))
def _polish(A0, evals, V, n: int):
    """One Newton-Schulz orthogonality polish + Rayleigh quotient vs the
    ORIGINAL matrices + ascending re-sort (same as ops/eigh.py)."""
    hiprec = jax.lax.Precision.HIGHEST
    vtv = jnp.einsum("xji,xjk->xik", V, V, precision=hiprec)
    V = 1.5 * V - 0.5 * jnp.einsum("xij,xjk->xik", V, vtv, precision=hiprec)
    AV = jnp.einsum("xij,xjk->xik", A0, V, precision=hiprec)
    evals = jnp.einsum("xji,xji->xi", V, AV, precision=hiprec)
    order = jnp.argsort(evals, axis=1)
    evals = jnp.take_along_axis(evals, order, axis=1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=2)
    return evals, V


# ---------------------------------------------------------------------------
# Host-side recursion.
# ---------------------------------------------------------------------------


class _Problem:
    __slots__ = ("H", "V", "m_true", "offset", "matrix")

    def __init__(self, H, V, m_true, offset, matrix):
        self.H = H  # (m, m) device, padded
        self.V = V  # (n, m) device isometry into the original basis
        self.m_true = int(m_true)
        self.offset = int(offset)  # global eigenvalue offset (ascending)
        self.matrix = int(matrix)  # index into the input batch


def _bucket_size(size: int, n: int) -> int:
    return min(_round_up(max(size, 1), _BUCKET_GRAN), n)


def _pad_batch(problems: List[_Problem], m: int):
    """Stacks per-problem (m, m) matrices; returns (H, m_true) device."""
    H = jnp.stack([p.H for p in problems])
    m_true = jnp.asarray([p.m_true for p in problems], jnp.int32)
    return H, m_true


def eigh_spectral_dc(
    matrices: jax.Array,
    leaf_size: int = LEAF_SIZE,
    max_retries: int = 2,
    _fallback=None,
    _force_fail: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched full symmetric eigendecomposition, ascending eigenvalues.

    Args:
        matrices: (..., n, n) fp32 symmetric (same n across the batch).
        leaf_size: subproblems at or below this size go to blocked Jacobi.
        max_retries: split retries (at shifted quantiles) before falling back
            to the stock solver for that matrix.
        _fallback: test hook - solver used for failed matrices (default:
            stock XLA eigh).

    Returns:
        (evals (..., n), evecs (..., n, n)), A ~= V diag(w) V^T.
    """
    from kronfluence_tpu.ops.eigh import eigh_batched

    batch_shape = matrices.shape[:-2]
    n = matrices.shape[-1]
    A = matrices.reshape((-1, n, n)).astype(jnp.float32)
    X = A.shape[0]

    if n <= leaf_size:
        return eigh_batched(matrices)

    mus = jnp.asarray(_get_schedule())
    num_iters = int(mus.shape[0])

    eye_n = jnp.eye(n, dtype=jnp.float32)
    problems = [
        _Problem(A[i], eye_n, n, 0, i) for i in range(X)
    ]
    solved: List[Tuple[_Problem, jax.Array, jax.Array]] = []  # (prob, evals, vecs)
    failed: List[int] = []
    retries: Dict[Tuple[int, int], int] = {}

    while problems:
        # ---- leaves ----
        leaves = [p for p in problems if p.m_true <= leaf_size or p.m_true <= 2]
        pending = [p for p in problems if p not in leaves]
        by_size: Dict[int, List[_Problem]] = {}
        for p in leaves:
            by_size.setdefault(p.H.shape[0], []).append(p)
        for m, group in by_size.items():
            H, m_true = _pad_batch(group, m)
            evals, vecs = eigh_batched(H)  # pads sort last (ascending)
            for j, p in enumerate(group):
                Vg = _compose_v(p.V, vecs[j])
                solved.append((p, evals[j], Vg))
        # ---- splits, bucketed by padded size ----
        by_size = {}
        for p in pending:
            by_size.setdefault(p.H.shape[0], []).append(p)
        next_problems: List[_Problem] = []
        for m, group in by_size.items():
            H, m_true = _pad_batch(group, m)
            quantile = jnp.asarray(
                [0.5 + 0.15 * retries.get((p.matrix, p.offset), 0) for p in group],
                jnp.float32,
            )
            Hc, Q, rank, quality = _split_bucket(H, m_true, quantile, mus, num_iters)
            rank_h = np.asarray(rank)
            quality_h = np.asarray(quality)
            VQ = None
            for j, p in enumerate(group):
                r = int(rank_h[j])
                ok = (
                    not _force_fail
                    and quality_h[j] < 1e-2
                    and 0 < r < p.m_true
                )
                if not ok:
                    tries = retries.get((p.matrix, p.offset), 0)
                    if tries < max_retries:
                        retries[(p.matrix, p.offset)] = tries + 1
                        next_problems.append(p)  # retry at a shifted quantile
                    else:
                        failed.append(len(solved))
                        solved.append((p, None, None))  # placeholder
                    continue
                if VQ is None:
                    VQ = _compose_v(
                        jnp.stack([q.V for q in group]), Q
                    )
                m_minus = _bucket_size(r, n)
                m_plus = _bucket_size(p.m_true - r, n)
                Hm, Vm, _ = _extract_child(
                    Hc[j : j + 1], VQ[j : j + 1], rank[j : j + 1],
                    m_true[j : j + 1], m_minus, True,
                )
                next_problems.append(
                    _Problem(Hm[0], Vm[0], r, p.offset, p.matrix)
                )
                Hp, Vp, _ = _extract_child(
                    Hc[j : j + 1], VQ[j : j + 1], rank[j : j + 1],
                    m_true[j : j + 1], m_plus, False,
                )
                next_problems.append(
                    _Problem(Hp[0], Vp[0], p.m_true - r, p.offset + r, p.matrix)
                )
        problems = next_problems

    # ---- assemble ----
    evals_buf = jnp.zeros((X, n), jnp.float32)
    vecs_buf = jnp.zeros((X, n, n), jnp.float32)
    failed_matrices = set()
    for entry in solved:
        p, ev, vg = entry
        if ev is None:
            failed_matrices.add(p.matrix)
    for p, ev, vg in solved:
        if p.matrix in failed_matrices:
            continue
        evals_buf = evals_buf.at[p.matrix, p.offset : p.offset + p.m_true].set(
            ev[: p.m_true]
        )
        vecs_buf = vecs_buf.at[
            p.matrix, :, p.offset : p.offset + p.m_true
        ].set(vg[:, : p.m_true])

    if failed_matrices:
        solve = _fallback or (lambda M: jnp.linalg.eigh(M))
        for i in sorted(failed_matrices):
            ev, vec = solve(A[i])
            evals_buf = evals_buf.at[i].set(ev)
            vecs_buf = vecs_buf.at[i].set(vec)

    evals_buf, vecs_buf = _polish(A, evals_buf, vecs_buf, n)
    return (
        evals_buf.reshape(batch_shape + (n,)),
        vecs_buf.reshape(batch_shape + (n, n)),
    )
