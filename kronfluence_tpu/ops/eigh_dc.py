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
  * Every device call in the recursion is BATCHED over a whole bucket (child
    extraction gathers all siblings in one program; solved leaves scatter into
    the output buffers in one donated update per group): on a tunneled TPU
    each dispatch costs ~5-10 ms, so the driver keeps the total op count per
    solve in the tens, not the thousands.

Per-problem robustness fallbacks (split retries at different quantiles,
rejection of non-converged sign iterations) are plain host Python - one more
advantage of keeping the recursion off the device.

Measured status (v5e via the tunneled axon backend, 2026-08-18,
benchmarks/micro_eigh.py on GPT-2's five factor dim groups): warmup 612 s and
a steady solve that did not finish within 580 s, vs stock QDWH's ~108 s
one-time compile + 13.2 s steady. The level-synchronous host loop still pays
hundreds of round-trips through the tunnel (rank fetches gate every level),
which dwarfs the device math at these dims. This solver is therefore NOT the
production default for moderate dims ("auto" -> QDWH, arguments.py); it is
the device path for LARGE_EIGH_DIM (>= 6144) matrices where QDWH's compile
time and workspace are infeasible, with host fp64 LAPACK as the OOM fallback
(ops/eigh.py:eigh_large).
"""

import math
from functools import partial
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

LEAF_SIZE = 256  # blocked-Jacobi leaf (2 x block_size 128); compile-cheap
_BUCKET_GRAN = 256  # child bucket sizes are multiples of this
_BATCH_GRAN = 8  # device batch dims are padded to multiples of this
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

    # Scheduled iterations run under a convergence-gated while_loop: the
    # schedule is sized for a worst-case 1e-6 relative gap at the split, but
    # the gap-refined split point usually leaves ~1e-2..1e-4, converging in
    # half the iterations. X^2 falls out of each step (Y2 / mu^2), so the
    # exit test costs one masked reduction against the dominant matmuls.
    # Exit at 0.12: two quadratic refinement steps then land well under the
    # 1e-2 acceptance threshold.
    mask2d_f = (valid[:, :, None] & valid[:, None, :]).astype(H.dtype)
    denom = jnp.maximum(m_true.astype(H.dtype), 1.0)

    def sign_err(X2, mu_sq):
        diff = X2 / mu_sq - jnp.eye(m, dtype=H.dtype)
        return jnp.max(
            jnp.sqrt(jnp.sum(jnp.square(diff * mask2d_f), axis=(1, 2)) / denom)
        )

    def cond(carry):
        i, _, err = carry
        return (i < num_iters - 2) & (err > 0.12)

    def body(carry):
        i, X, _ = carry
        mu = mus[i]
        Y = mu * X
        Y2 = jnp.matmul(Y, Y, precision=loprec)
        X_next = 1.5 * Y - 0.5 * jnp.matmul(Y2, Y, precision=loprec)
        return i + 1, X_next, sign_err(Y2, mu * mu)

    _, X, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), X, jnp.asarray(jnp.inf, H.dtype))
    )
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
def _extract_children(Hc, VQ, rank, m_true, sel, m_child: int, minus: bool):
    """Extracts the (minus|plus) diagonal blocks of rotated matrices into
    `m_child`-padded child problems, batched over a sibling selection.

    Args:
        Hc, VQ, rank, m_true: split outputs for the whole parent bucket
            ((k, m, m), (k, n, m), (k,), (k,)).
        sel: (j,) int32 parent-row indices (padded selections repeat a row).

    Returns (H_child (j, m_child, m_child), V_child (j, n, m_child)).
    """
    Hc = Hc[sel]
    VQ = VQ[sel]
    rank = rank[sel]
    m_true = m_true[sel]
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
    return Hr, Vr


@jax.jit
def _gather_rows(H, V, sel):
    """Row gather for split retries (padded selections repeat a row)."""
    return H[sel], V[sel]


@jax.jit
def _compose_v(V, Q):
    return jnp.matmul(V, Q, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, donate_argnames=("evals_buf", "vecs_buf"))
def _scatter_pieces(evals_buf, vecs_buf, ev, V, matrix, offset, m_eff):
    """Scatters a solved leaf group into the output buffers in one update.

    Args:
        evals_buf: (X, n); vecs_buf: (X, n, n) - donated accumulators.
        ev: (k, m) ascending leaf eigenvalues (pads sort last).
        V: (k, n, m) leaf eigenvectors in the original basis.
        matrix: (k,) int32 target matrix of each piece.
        offset: (k,) int32 global eigenvalue offset of each piece.
        m_eff: (k,) int32 true piece dims; 0 disables a (padding) row.
    """
    k, n, m = V.shape
    cols = offset[:, None] + jnp.arange(m)[None, :]  # (k, m)
    mask = jnp.arange(m)[None, :] < m_eff[:, None]
    cols = jnp.clip(cols, 0, evals_buf.shape[1] - 1)
    # Clipped duplicate columns only ever receive masked (zero) adds.
    evals_buf = evals_buf.at[matrix[:, None], cols].add(ev * mask)
    vecs_buf = vecs_buf.at[
        matrix[:, None, None], jnp.arange(n)[None, :, None], cols[:, None, :]
    ].add(V * mask[:, None, :])
    return evals_buf, vecs_buf


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
# Host-side recursion over stacked level-synchronous groups.
# ---------------------------------------------------------------------------


class _Group:
    """A bucket of same-padded-size subproblems, stacked on device.

    H: (k, m, m) padded symmetric blocks; V: (k, n, m) isometries into the
    original basis. Host metadata (numpy, length k): target `matrix` index,
    global eigenvalue `offset`, true dim `m_true`, retry count `tries`, and
    `real` (False rows are batch padding - duplicated live rows that keep
    device shapes in _BATCH_GRAN multiples without NaN-producing dummies).
    """

    __slots__ = ("H", "V", "matrix", "offset", "m_true", "tries", "real")

    def __init__(self, H, V, matrix, offset, m_true, tries, real):
        self.H = H
        self.V = V
        self.matrix = matrix
        self.offset = offset
        self.m_true = m_true
        self.tries = tries
        self.real = real


def _batch_gran(m: int) -> int:
    """Batch-dim padding granularity for an (k, m, m) bucket: 8 for small
    matrices, shrinking so padded rows never add more than ~256 MB / their
    matching compute at Llama-scale dims (a 14336^2 block is 822 MB — padding
    a single-matrix solve to 8 would 8x both HBM and MXU work)."""
    return max(1, min(_BATCH_GRAN, 67_108_864 // (m * m)))


def _pad_sel(sel: np.ndarray, m: int) -> np.ndarray:
    """Pads a selection to a `_batch_gran(m)` multiple — but never past the
    next power of two of the real count, so small selections of expensive
    buckets are not padded with multiples of their own work (1 matrix at
    3073 must not run 7x the sign-iteration FLOPs). Padded entries repeat
    the first one; callers flag them real=False."""
    gran = _batch_gran(m)
    k = min(_round_up(sel.size, gran), 1 << (sel.size - 1).bit_length())
    if k <= sel.size:
        return sel
    return np.concatenate([sel, np.full(k - sel.size, sel[0], sel.dtype)])


def _merge_groups(parts: List[_Group]) -> _Group:
    if len(parts) == 1:
        return parts[0]
    return _Group(
        jnp.concatenate([g.H for g in parts]),
        jnp.concatenate([g.V for g in parts]),
        np.concatenate([g.matrix for g in parts]),
        np.concatenate([g.offset for g in parts]),
        np.concatenate([g.m_true for g in parts]),
        np.concatenate([g.tries for g in parts]),
        np.concatenate([g.real for g in parts]),
    )


def _bucket_size(size: int, n: int) -> int:
    return min(_round_up(max(size, 1), _BUCKET_GRAN), n)


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
        leaf_size: subproblems at or below this size go to blocked Jacobi
            (applied at bucket granularity: rounded up to a _BUCKET_GRAN
            multiple, so values below 256 behave as 256).
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

    sel0 = _pad_sel(np.arange(X, dtype=np.int32), n)
    k0 = sel0.size
    root = _Group(
        A[sel0] if k0 != X else A,
        jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (k0, n, n)),
        sel0.astype(np.int64),
        np.zeros(k0, np.int64),
        np.full(k0, n, np.int64),
        np.zeros(k0, np.int64),
        np.arange(k0) < X,
    )
    groups: Dict[int, _Group] = {n: root}

    evals_buf = jnp.zeros((X, n), jnp.float32)
    vecs_buf = jnp.zeros((X, n, n), jnp.float32)
    failed_matrices = set()

    while groups:
        next_parts: Dict[int, List[_Group]] = {}
        for m in sorted(groups, reverse=True):
            g = groups[m]
            k = g.m_true.shape[0]
            # Buckets are _BUCKET_GRAN multiples, so the effective leaf
            # threshold is leaf_size rounded up to a bucket: a bucket whose
            # members' true dims are all <= that goes to Jacobi whole
            # (the batched solver is accurate at any size; leaf_size is a
            # performance knob).
            if m <= _round_up(leaf_size, _BUCKET_GRAN):
                # ---- leaves: batched Jacobi + batched compose + scatter ----
                ev, vecs = eigh_batched(g.H)  # pads sort last (ascending)
                Vg = _compose_v(g.V, vecs)
                m_eff = np.where(g.real, g.m_true, 0)
                evals_buf, vecs_buf = _scatter_pieces(
                    evals_buf,
                    vecs_buf,
                    ev,
                    Vg,
                    jnp.asarray(g.matrix, jnp.int32),
                    jnp.asarray(g.offset, jnp.int32),
                    jnp.asarray(m_eff, jnp.int32),
                )
                continue
            # ---- split the whole bucket in one program ----
            m_true_dev = jnp.asarray(g.m_true, jnp.int32)
            quantile = jnp.asarray(0.5 + 0.15 * g.tries, jnp.float32)
            Hc, Q, rank, quality = _split_bucket(
                g.H, m_true_dev, quantile, mus, num_iters
            )
            # One host sync per bucket: ranks + qualities together.
            rq = np.asarray(
                jnp.concatenate([rank.astype(jnp.float32), quality])
            )
            rank_h = rq[:k].astype(np.int64)
            quality_h = rq[k:]

            ok = (
                (not _force_fail)
                & (quality_h < 1e-2)
                & (rank_h > 0)
                & (rank_h < g.m_true)
                & g.real
            )
            retry = ~ok & g.real & (g.tries < max_retries)
            exhausted = ~ok & g.real & (g.tries >= max_retries)
            for i in np.nonzero(exhausted)[0]:
                failed_matrices.add(int(g.matrix[i]))

            retry_idx = np.nonzero(retry)[0]
            if retry_idx.size:
                sel = _pad_sel(retry_idx.astype(np.int32), m)
                Hr, Vr = _gather_rows(g.H, g.V, jnp.asarray(sel))
                next_parts.setdefault(m, []).append(
                    _Group(
                        Hr,
                        Vr,
                        g.matrix[sel],
                        g.offset[sel],
                        g.m_true[sel],
                        g.tries[sel] + 1,
                        np.arange(sel.size) < retry_idx.size,
                    )
                )

            # ---- children: one extraction program per (bucket, side) ----
            ok_idx = np.nonzero(ok)[0]
            if ok_idx.size == 0:
                continue
            # Composed lazily: an all-retry bucket must not pay the full
            # (k, n, m) x (k, m, m) composition it would never use.
            VQ = _compose_v(g.V, Q)
            child_m = {
                True: np.array(
                    [_bucket_size(int(rank_h[j]), n) for j in ok_idx]
                ),
                False: np.array(
                    [
                        _bucket_size(int(g.m_true[j] - rank_h[j]), n)
                        for j in ok_idx
                    ]
                ),
            }
            for minus in (True, False):
                for mc in np.unique(child_m[minus]):
                    pick = ok_idx[child_m[minus] == mc]
                    sel = _pad_sel(pick.astype(np.int32), int(mc))
                    Hch, Vch = _extract_children(
                        Hc, VQ, rank, m_true_dev, jnp.asarray(sel),
                        int(mc), bool(minus),
                    )
                    sizes = (
                        rank_h[sel] if minus else g.m_true[sel] - rank_h[sel]
                    )
                    offsets = (
                        g.offset[sel]
                        if minus
                        else g.offset[sel] + rank_h[sel]
                    )
                    next_parts.setdefault(int(mc), []).append(
                        _Group(
                            Hch,
                            Vch,
                            g.matrix[sel],
                            offsets,
                            sizes,
                            np.zeros(sel.size, np.int64),
                            np.arange(sel.size) < pick.size,
                        )
                    )
        groups = {m: _merge_groups(parts) for m, parts in next_parts.items()}

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
