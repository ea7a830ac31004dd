"""TPU-native batched symmetric eigensolver (blocked cyclic Jacobi).

Why not `jnp.linalg.eigh`: XLA's QDWH spectral divide-and-conquer emits an
~80 MB executable per matrix shape that takes minutes to compile (and tens of
seconds to even *load* from the persistent compilation cache), because the
recursive D&C structure unrolls into enormous HLO. The reference pays none of
this (cuSOLVER `syevd` is a prebuilt library: 7.8 s for the whole GPT-2 factor
set, kronfluence/factor/eigen.py:199-210). This module is the replacement: a
hand-written two-level cyclic Jacobi eigensolver whose HLO is a few small
loops over gathers and batched matmuls — it compiles in seconds, runs batched
over all same-shape factor matrices at once, and keeps all O(n^3) work on the
MXU.

Algorithm
---------
Two-sided blocked Jacobi with a round-robin (tournament) ordering:

  * Outer level: the n x n matrix is tiled into NB = n/b blocks. Each sweep
    visits NB-1 rounds; in a round, NB/2 disjoint block pairs (p, q) are
    processed simultaneously. For each pair the 2b x 2b pivot subproblem is
    (approximately) diagonalized, and the resulting orthogonal rotations are
    applied to the full matrix as batched (2b x 2b) @ (2b x n) matmuls —
    MXU-shaped work, no scalar loops over the big matrix.
  * Inner level: the 2b x 2b pivot subproblems are diagonalized by scalar
    cyclic Jacobi, vectorized across all NB/2 pairs and the matrix batch at
    once (each rotation round is two gathers + fused multiply-adds on a
    (batch * NB/2, 2b, 2b) tensor).

Block Jacobi converges even with approximate pivot solves, so the inner level
runs a small fixed number of sweeps; the outer level iterates until the
off-diagonal Frobenius norm is negligible (with a fixed sweep cap so the
program is a bounded `lax.while_loop`).

Jacobi is also the most *accurate* dense symmetric eigensolver (it computes
small eigenvalues of positive-definite matrices to high relative accuracy),
which matters here: EK-FAC divides by `eigenvalues + damping`.

Matrices whose dimension is not a multiple of 2b are padded with an identity
block scaled to sort above the true spectrum, so padded eigenpairs land at the
end of the ascending order and are sliced off.
"""

import math
import os
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _round_robin_schedule(m: int) -> np.ndarray:
    """Tournament schedule: (m-1) rounds of m/2 disjoint index pairs."""
    assert m % 2 == 0
    players = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = []
        for k in range(m // 2):
            a, b = players[k], players[m - 1 - k]
            pairs.append((min(a, b), max(a, b)))
        rounds.append(sorted(pairs))
        players = [players[0], players[-1]] + players[1:-1]
    return np.asarray(rounds, np.int32)  # (m-1, m/2, 2)


def _scalar_schedule_tables(m: int):
    """Precomputed per-round index tables for scalar Jacobi on m x m."""
    sched = _round_robin_schedule(m)  # (m-1, m/2, 2)
    rounds = sched.shape[0]
    p_tab = sched[:, :, 0]  # (rounds, m/2)
    q_tab = sched[:, :, 1]
    partner = np.zeros((rounds, m), np.int32)
    for r in range(rounds):
        partner[r, p_tab[r]] = q_tab[r]
        partner[r, q_tab[r]] = p_tab[r]
    return jnp.asarray(p_tab), jnp.asarray(q_tab), jnp.asarray(partner)


def _scalar_jacobi_rotations(a_pp, a_qq, a_pq, eps):
    """Stable Jacobi rotation (c, s) zeroing a_pq; vectorized."""
    # Rutishauser's formulas. Guard a_pq ~ 0 -> identity rotation.
    denom = 2.0 * a_pq
    tau = (a_qq - a_pp) / jnp.where(denom == 0.0, 1.0, denom)
    sign_tau = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = sign_tau / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    scale = jnp.sqrt(jnp.abs(a_pp * a_qq)) + jnp.abs(a_pp) + jnp.abs(a_qq)
    active = jnp.abs(a_pq) > eps * scale
    t = jnp.where(active, t, 0.0)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s


def _scalar_jacobi(S: jax.Array, sweeps: int, eps: float) -> jax.Array:
    """Scalar cyclic Jacobi on a batch (Y, m, m); returns rotations V only.

    The matrix batch is updated in place alongside V so later rounds see
    current entries; V accumulates as S_orig = V S_final V^T with V orthogonal.
    """
    y, m, _ = S.shape
    p_tab, q_tab, partner_tab = _scalar_schedule_tables(m)
    rounds = m - 1
    eye = jnp.broadcast_to(jnp.eye(m, dtype=S.dtype), (y, m, m))

    def body(step, carry):
        A, V = carry
        r = step % rounds
        p = p_tab[r]
        q = q_tab[r]
        partner = partner_tab[r]
        a_pp = A[:, p, p]
        a_qq = A[:, q, q]
        a_pq = A[:, p, q]
        c, s = _scalar_jacobi_rotations(a_pp, a_qq, a_pq, eps)
        # alpha[i], beta[i] such that row_i' = alpha_i*row_i + beta_i*row_partner(i)
        alpha = jnp.ones((y, m), A.dtype).at[:, p].set(c).at[:, q].set(c)
        beta = jnp.zeros((y, m), A.dtype).at[:, p].set(-s).at[:, q].set(s)
        # Rows: R^T A ; cols: (.) R ; V: V R.
        A = alpha[:, :, None] * A + beta[:, :, None] * jnp.take(A, partner, axis=1)
        A = alpha[:, None, :] * A + beta[:, None, :] * jnp.take(A, partner, axis=2)
        V = alpha[:, None, :] * V + beta[:, None, :] * jnp.take(V, partner, axis=2)
        return A, V

    _, V = jax.lax.fori_loop(0, sweeps * rounds, body, (S, eye))
    return V


def _block_index_tables(n: int, two_b: int):
    """Per-round row permutations grouping paired blocks adjacently.

    Returns (delta, restore, rounds): `delta[r]` maps the PREVIOUS round's
    layout directly to round r's layout (composed permutation — one gather
    instead of undo+redo), and `restore` maps the last round's layout back to
    canonical. delta[0] assumes canonical input, so a sweep must start from
    canonical layout (the sweep loop restores at sweep end).
    """
    nb = n // (two_b // 2)
    sched = _round_robin_schedule(nb)  # (nb-1, nb/2, 2) block pairs
    b = two_b // 2
    rounds = sched.shape[0]
    perm = np.zeros((rounds, n), np.int32)
    inv = np.zeros((rounds, n), np.int32)
    for r in range(rounds):
        order = []
        for p, q in sched[r]:
            order.extend(range(p * b, (p + 1) * b))
            order.extend(range(q * b, (q + 1) * b))
        order = np.asarray(order, np.int32)
        perm[r] = order
        inv[r, order] = np.arange(n, dtype=np.int32)
    delta = np.zeros_like(perm)
    delta[0] = perm[0]
    for r in range(1, rounds):
        delta[r] = inv[r - 1][perm[r]]
    restore = inv[rounds - 1]
    return jnp.asarray(delta), jnp.asarray(restore), rounds


@partial(
    jax.jit,
    static_argnames=("block_size", "inner_sweeps", "max_sweeps", "use_pallas", "fast_sweeps"),
)
def _blocked_jacobi_eigh(
    A: jax.Array,
    block_size: int,
    inner_sweeps: int,
    max_sweeps: int,
    tol: float,
    use_pallas: bool = False,
    fast_sweeps: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Core solver: A (X, n, n) fp32 symmetric, n a multiple of 2*block_size.

    With `fast_sweeps`, the bulk of the off-diagonal mass is annihilated in a
    first convergence loop whose rotation applications run at
    `Precision.HIGH` (bf16_3x on the MXU — 2x the fp32 matmul rate); a second
    loop at `Precision.HIGHEST` then drives the off-norm to the fp32 floor.
    Block Jacobi tolerates inexact updates (each round re-reads the current
    matrix), so the coarse phase only needs to be roughly right; the final
    Newton-Schulz polish + Rayleigh quotient below restore eigenvector
    orthogonality and eigenvalue accuracy against the ORIGINAL matrix."""
    x, n, _ = A.shape
    two_b = 2 * block_size
    np_pairs = n // two_b  # pairs per round
    delta_tab, restore, rounds = _block_index_tables(n, two_b)
    eps = float(jnp.finfo(A.dtype).eps)
    hi = jax.lax.Precision.HIGHEST

    W = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (x, n, n))
    pair_idx = jnp.arange(np_pairs)

    def make_one_round(prec):
        def one_round(r, carry):
            # Carries (A, W) in the PREVIOUS round's permuted layout; delta
            # maps straight into this round's layout (composed permutation: 3
            # gathers per round instead of 6 undo+redo gathers).
            A, W = carry
            delta = delta_tab[r]
            Ap = jnp.take(jnp.take(A, delta, axis=1), delta, axis=2)
            Wp = jnp.take(W, delta, axis=2)
            # Extract diagonal 2b x 2b pivot blocks.
            S = Ap.reshape(x, np_pairs, two_b, np_pairs, two_b)
            S = S[:, pair_idx, :, pair_idx, :]  # (np_pairs, x, 2b, 2b)
            S = S.transpose(1, 0, 2, 3).reshape(x * np_pairs, two_b, two_b)
            if use_pallas:
                from kronfluence_tpu.ops.pallas.jacobi import jacobi_pivot_rotations

                V = jacobi_pivot_rotations(S, inner_sweeps, eps=eps, interpret=False)
                # interpret=False is safe here: `use_pallas` comes from the
                # kernel-specific self-probe (jacobi_works), not just the
                # generic Pallas capability check.
            else:
                V = _scalar_jacobi(S, inner_sweeps, eps)
            V = V.reshape(x, np_pairs, two_b, two_b)
            # Rows: V^T @ A-rows  (batched MXU matmul).
            rows = Ap.reshape(x, np_pairs, two_b, n)
            rows = jnp.einsum("xkij,xkin->xkjn", V, rows, precision=prec)
            # Cols: (.) @ V.
            cols = rows.reshape(x, n, n).reshape(x, n, np_pairs, two_b)
            cols = jnp.einsum("xnki,xkij->xnkj", cols, V, precision=prec)
            Wp = jnp.einsum(
                "xnki,xkij->xnkj", Wp.reshape(x, n, np_pairs, two_b), V, precision=prec
            )
            return cols.reshape(x, n, n), Wp.reshape(x, n, n)

        return one_round

    off_mask = 1.0 - jnp.eye(n, dtype=A.dtype)

    def off_norm_sq(A):
        # Strictly-off-diagonal sum: no cancellation, so early exit works and
        # the sweep count (hence rotation-accumulation drift in W) stays low.
        return jnp.sum(jnp.square(A * off_mask), axis=(1, 2))

    total_sq = jnp.sum(A * A, axis=(1, 2))
    # fp32 rotations floor the off-norm at ~O(eps * sqrt(n)) relative; a
    # tolerance below that floor would always exhaust max_sweeps.
    tol = jnp.maximum(tol, 8.0 * eps * math.sqrt(n))
    A0 = A

    def make_loop(prec, loop_tol, budget):
        one_round = make_one_round(prec)

        def cond(state):
            A, _, sweep = state
            not_done = jnp.any(off_norm_sq(A) > (loop_tol * loop_tol) * total_sq)
            return jnp.logical_and(sweep < budget, not_done)

        def sweep_body(state):
            A, W, sweep = state
            A, W = jax.lax.fori_loop(0, rounds, one_round, (A, W))
            # Restore canonical layout (delta[0] expects it at the next sweep).
            A = jnp.take(jnp.take(A, restore, axis=1), restore, axis=2)
            W = jnp.take(W, restore, axis=2)
            # Re-symmetrize to curb numerical drift.
            A = 0.5 * (A + A.transpose(0, 2, 1))
            return A, W, sweep + 1

        return cond, sweep_body

    sweep0 = jnp.zeros((), jnp.int32)
    if fast_sweeps:
        # Coarse phase: bf16_3x rotations until the off-norm is ~1e-3
        # relative (or 3/4 of the budget is spent).
        coarse_tol = jnp.maximum(jnp.asarray(1e-3, A.dtype), tol)
        cond_c, body_c = make_loop(
            jax.lax.Precision.HIGH, coarse_tol, max(1, (3 * max_sweeps) // 4)
        )
        A, W, sweep0 = jax.lax.while_loop(cond_c, body_c, (A, W, sweep0))
    cond_f, body_f = make_loop(hi, tol, max_sweeps)
    A, W, _ = jax.lax.while_loop(cond_f, body_f, (A, W, sweep0))

    # Polish: one Newton-Schulz step restores the orthogonality lost to
    # rotation-accumulation round-off (quadratic: 5e-4 -> ~1e-7), then a
    # Rayleigh quotient against the ORIGINAL matrix recovers eigenvalues to
    # the polished accuracy.
    hi = jax.lax.Precision.HIGHEST
    wtw = jnp.einsum("xji,xjk->xik", W, W, precision=hi)
    W = 0.5 * (3.0 * W - jnp.einsum("xij,xjk->xik", W, wtw, precision=hi))
    AW = jnp.einsum("xij,xjk->xik", A0, W, precision=hi)
    evals = jnp.einsum("xji,xji->xi", W, AW, precision=hi)
    order = jnp.argsort(evals, axis=1)
    evals = jnp.take_along_axis(evals, order, axis=1)
    W = jnp.take_along_axis(W, order[:, None, :], axis=2)
    return evals, W


_STOCK_EIGH_JIT = None


def _stock_eigh_jit():
    """Module-level jitted `jnp.linalg.eigh` singleton.

    A fresh `jax.jit(jnp.linalg.eigh)` per call would create a new PjitFunction
    whose in-memory executable cache starts empty: every steady-state
    eigendecomposition would then re-key through the persistent compilation
    cache (hashing + deserializing the ~80 MB QDWH executables), costing real
    seconds per stage invocation on a tunneled backend."""
    global _STOCK_EIGH_JIT
    if _STOCK_EIGH_JIT is None:
        _STOCK_EIGH_JIT = jax.jit(jnp.linalg.eigh)
    return _STOCK_EIGH_JIT


def stock_eigh_chunk(x: int, n: int, budget_elems: Optional[int] = None) -> int:
    """The chunk size `eigh_stock_batched` compiles for a (x, n, n) batch.

    Shared with `prewarm_stock_eigh` so prewarmed executables carry exactly
    the shapes the production solve will dispatch. Chunks are sized EVENLY
    (12 -> 4+4+4, not 5+5+2) so every chunk shares one compiled executable."""
    if budget_elems is None:
        # KF_EIGH_BUDGET_ELEMS tunes the chunk/HBM trade (A/B measurement:
        # benchmarks/micro_eigh_groups.py); default keeps QDWH workspaces
        # well clear of resident factor state.
        budget_elems = int(os.environ.get("KF_EIGH_BUDGET_ELEMS", 48_000_000))
    chunk_max = max(1, min(x, budget_elems // (n * n)))
    n_chunks = -(-x // chunk_max)
    return -(-x // n_chunks)


_PREWARMED_SHAPES = set()


def prewarm_stock_eigh(group_shapes) -> None:
    """Compiles every QDWH executable the given (x, n) batches will need, on
    threads — the remote XLA compile server builds distinct programs in
    parallel (measured: benchmarks/micro_compile_overlap.py), so a cold eigh
    warmup costs roughly the SLOWEST per-shape compile instead of the sum
    (GPT-2's three merged dim groups: ~415 s sequential). Each thread runs the
    jitted solve once on a distinct-eigenvalue diagonal dummy so the
    executable lands in the jit's in-memory dispatch cache (an AOT
    lower().compile() would only populate the persistent cache, leaving the
    real solve to pay a multi-second ~80 MB deserialization per shape).

    Idempotent per (chunk, n): shapes already prewarmed or already solved
    this process are skipped, so steady-state stages pay nothing.
    """
    import threading

    jobs = []
    seen = set()
    for x, n in group_shapes:
        chunk = stock_eigh_chunk(int(x), int(n))
        key = (chunk, int(n))
        if key not in _PREWARMED_SHAPES and key not in seen:
            seen.add(key)  # dedupe in-flight jobs without marking them warmed
            jobs.append(key)
    if not jobs:
        return
    f = _stock_eigh_jit()
    errors = []

    def warm(chunk, n):
        try:
            diag = jnp.linspace(1.0, 2.0, n, dtype=jnp.float32)
            dummy = jnp.broadcast_to(jnp.diag(diag), (chunk, n, n))
            jax.block_until_ready(f(dummy))
            # Mark warmed only AFTER the compile+run succeeds: a failed warm
            # must not permanently skip the shape (the production solve would
            # then silently pay the full cold compile on a retry).
            _PREWARMED_SHAPES.add((chunk, n))
        except Exception as exc:  # noqa: BLE001 — surfaced after join
            errors.append(exc)

    threads = [threading.Thread(target=warm, args=j, daemon=True) for j in jobs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def eigh_stock_batched(
    matrices: jax.Array, budget_elems: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """Batched symmetric eigendecomposition via XLA's built-in `eigh` (QDWH
    spectral divide-and-conquer), chunked to bound peak HBM.

    Measured on a v5e chip (fetch-synced steady state, GPT-2 factor shapes):
    3-4.5x faster than the blocked-Jacobi solver below — (12, 3073) in 14.1 s
    vs 46.5 s, (36, 769) in 0.93 s vs 4.1 s. The price is compile time: QDWH's
    recursive structure unrolls into ~80 MB executables that take minutes to
    build per matrix shape (vs seconds for the Jacobi solver), amortized by
    the persistent compilation cache. This is the default production solver;
    `FactorArguments.eigendecomposition_solver = "jacobi"` opts into the
    fast-compile solver for one-off shapes.
    """
    batch_shape = matrices.shape[:-2]
    n = matrices.shape[-1]
    A = matrices.reshape((-1, n, n)).astype(jnp.float32)
    # QDWH workspace holds several (n, n) buffers per matrix; chunk large
    # batches so eigendecomposition never competes with resident factor state
    # (chunk sizing: stock_eigh_chunk).
    x = A.shape[0]
    chunk = stock_eigh_chunk(x, n, budget_elems)
    _PREWARMED_SHAPES.add((chunk, n))  # a direct solve warms the shape too
    ev_parts, vec_parts = [], []
    f = _stock_eigh_jit()
    for start in range(0, x, chunk):
        part = A[start : start + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate([part, jnp.broadcast_to(jnp.eye(n, dtype=part.dtype), (pad, n, n))])
        ev, vec = f(part)
        ev_parts.append(ev[: chunk - pad] if pad else ev)
        vec_parts.append(vec[: chunk - pad] if pad else vec)
    evals = jnp.concatenate(ev_parts, axis=0) if len(ev_parts) > 1 else ev_parts[0]
    vecs = jnp.concatenate(vec_parts, axis=0) if len(vec_parts) > 1 else vec_parts[0]
    return (
        evals.reshape(batch_shape + (n,)),
        vecs.reshape(batch_shape + (n, n)),
    )


# Above this dimension, matrices are eigendecomposed one at a time (QDWH's
# workspace for a single 14336^2 fp32 matrix is already multiple GB) with a
# host-LAPACK fp64 fallback on device memory exhaustion — the TPU analogue of
# the reference's GPU->CPU OOM retry (kronfluence/factor/eigen.py:199-213).

# KF_LARGE_EIGH_DIM lowers the threshold when a backend's dispatch limits
# make even mid-size batched solves fragile (per-matrix host-driven sweeps
# at 4096 cost ~10 s each — cheap insurance on flaky tunnels).
LARGE_EIGH_DIM = int(os.environ.get("KF_LARGE_EIGH_DIM", 6144))


@partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=("block_size", "inner_sweeps", "use_pallas", "high_prec", "pivot"),
)
def _jacobi_one_sweep(
    A, W, block_size, inner_sweeps, use_pallas, high_prec, pivot="scalar"
):
    """ONE blocked-Jacobi sweep as a standalone bounded program.

    At Llama dims a full convergence `while_loop` inside one program runs for
    many device-minutes; on this tunneled backend such long dispatches die
    with `UNAVAILABLE: TPU device error` (measured 2026-08-19: the
    single-program solver faulted ~7 min into a 14336^2 warmup solve that the
    per-sweep form completes). Here the convergence loop lives on the HOST:
    each sweep is one dispatch of a few device-seconds, and the off-diagonal
    norm it returns drives the host-side termination test.

    Carries the same layout contract as `_blocked_jacobi_eigh`: enters and
    leaves canonical layout, re-symmetrizes at sweep end.
    """
    x, n, _ = A.shape
    two_b = 2 * block_size
    np_pairs = n // two_b
    delta_tab, restore, rounds = _block_index_tables(n, two_b)
    eps = float(jnp.finfo(A.dtype).eps)
    prec = jax.lax.Precision.HIGHEST if high_prec else jax.lax.Precision.HIGH
    pair_idx = jnp.arange(np_pairs)

    def one_round(r, carry):
        A, W = carry
        delta = delta_tab[r]
        Ap = jnp.take(jnp.take(A, delta, axis=1), delta, axis=2)
        Wp = jnp.take(W, delta, axis=2)
        S = Ap.reshape(x, np_pairs, two_b, np_pairs, two_b)
        S = S[:, pair_idx, :, pair_idx, :]
        S = S.transpose(1, 0, 2, 3).reshape(x * np_pairs, two_b, two_b)
        if pivot == "eigh":
            # EXACT pivot diagonalization via XLA's batched small-dim eigh.
            # At Llama dims the scalar pivot path's serial rotation chain
            # (inner rounds x outer rounds of tiny VPU ops) dominated the
            # sweep (~50 s/sweep at 14336) and its approximate pivots slowed
            # outer convergence to ~0.6x off-norm per sweep; exact pivots
            # make each sweep a true block-cyclic step (classically ~2-4
            # sweeps of linear reduction then quadratic).
            _, V = jnp.linalg.eigh(S)
        elif use_pallas:
            from kronfluence_tpu.ops.pallas.jacobi import jacobi_pivot_rotations

            V = jacobi_pivot_rotations(S, inner_sweeps, eps=eps, interpret=False)
        else:
            V = _scalar_jacobi(S, inner_sweeps, eps)
        V = V.reshape(x, np_pairs, two_b, two_b)
        rows = Ap.reshape(x, np_pairs, two_b, n)
        rows = jnp.einsum("xkij,xkin->xkjn", V, rows, precision=prec)
        cols = rows.reshape(x, n, n).reshape(x, n, np_pairs, two_b)
        cols = jnp.einsum("xnki,xkij->xnkj", cols, V, precision=prec)
        Wp = jnp.einsum(
            "xnki,xkij->xnkj", Wp.reshape(x, n, np_pairs, two_b), V, precision=prec
        )
        return cols.reshape(x, n, n), Wp.reshape(x, n, n)

    A, W = jax.lax.fori_loop(0, rounds, one_round, (A, W))
    A = jnp.take(jnp.take(A, restore, axis=1), restore, axis=2)
    W = jnp.take(W, restore, axis=2)
    A = 0.5 * (A + A.transpose(0, 2, 1))
    off_mask = 1.0 - jnp.eye(n, dtype=A.dtype)
    off = jnp.sum(jnp.square(A * off_mask), axis=(1, 2))
    return A, W, off


@partial(jax.jit, static_argnames=("n_true", "ns_steps"))
def _jacobi_polish(A0, A, W, n_true, ns_steps=1):
    """Newton-Schulz orthogonality polish + Rayleigh quotient vs the ORIGINAL
    matrix, then ascending sort and padded-eigenpair slice (same math as the
    single-program solver's epilogue).

    `ns_steps`: NS orthogonalization iterations. One step suffices below
    ~2e-3 drift (quadratic); at Llama dims the accumulated rotation drift
    after ~20 sweeps measured ~4e-2, so the large path runs 3 steps
    (each is two n^3 matmuls — seconds at 14336, vs minutes per sweep)."""
    hi = jax.lax.Precision.HIGHEST
    for _ in range(ns_steps):
        wtw = jnp.einsum("xji,xjk->xik", W, W, precision=hi)
        W = 0.5 * (3.0 * W - jnp.einsum("xij,xjk->xik", W, wtw, precision=hi))
    AW = jnp.einsum("xij,xjk->xik", A0, W, precision=hi)
    evals = jnp.einsum("xji,xji->xi", W, AW, precision=hi)
    order = jnp.argsort(evals, axis=1)
    evals = jnp.take_along_axis(evals, order, axis=1)
    W = jnp.take_along_axis(W, order[:, None, :], axis=2)
    return evals[:, :n_true], W[:, :n_true, :n_true]


def eigh_jacobi_hostloop(
    matrices,
    block_size: int = 32,
    inner_sweeps: int = 2,
    max_sweeps: int = 24,
    tol: float = 1e-6,
    verbose: bool = False,
    pivot: str = "eigh",
) -> Tuple[jax.Array, jax.Array]:
    """Blocked-Jacobi eigendecomposition with a HOST-side convergence loop.

    Numerically identical in structure to `eigh_batched` (coarse bf16_3x
    sweeps to ~1e-3 relative off-norm, then fp32-HIGHEST sweeps to the fp32
    floor, Newton-Schulz + Rayleigh polish) but each sweep is its own bounded
    dispatch, so no device program runs longer than a few seconds — the form
    that survives this backend's long-dispatch faults at Llama dims (the
    single-program `eigh_batched` died `UNAVAILABLE` ~7 min into a 14336^2
    solve). The per-sweep off-norm fetch (one scalar per matrix) is the only
    extra host<->device traffic; it doubles as adaptive termination: the
    fine phase also stops when a sweep no longer improves the off-norm
    (fp32 rotation floor reached), so `max_sweeps` is a cap, not a target.

    Pivot subproblems default to EXACT batched `jnp.linalg.eigh` solves
    (`pivot="eigh"`): small-dim QDWH at (x*np_pairs, 2b, 2b) is fast and
    fully parallel, and exact pivots converge in far fewer outer sweeps than
    the approximate scalar path (`pivot="scalar"`, which measured ~0.6x
    off-norm per sweep at ~50 s/sweep at 14336 — its serial rotation chain
    of tiny VPU ops dominates). The Mosaic pivot kernel is never used here:
    it crashed the TPU worker at the 14336-dim production shape (2026-08-19,
    batch 112 of 64x64 pivots) despite passing its 64-batch self-probe.
    """
    batch_shape = matrices.shape[:-2]
    n = matrices.shape[-1]
    A = jnp.asarray(matrices, jnp.float32).reshape((-1, n, n))
    two_b = 2 * block_size
    n_pad = int(math.ceil(n / two_b) * two_b)
    if n_pad != n:
        bound = jnp.max(jnp.sum(jnp.abs(A), axis=2), axis=1)  # Gershgorin
        big = jnp.zeros((A.shape[0], n_pad, n_pad), jnp.float32)
        big = big.at[:, :n, :n].set(A)
        pad_diag = jnp.arange(n, n_pad)
        A = big.at[:, pad_diag, pad_diag].set((4.0 * bound + 1.0)[:, None])
    x = A.shape[0]
    # The sweeps DONATE (A, W); A0 must be a distinct buffer (the polish
    # computes the Rayleigh quotient against the original), and W must be a
    # materialized array, not a broadcast view.
    A0 = A
    A = A + 0.0
    W = jnp.tile(jnp.eye(n_pad, dtype=A.dtype)[None], (x, 1, 1))
    eps = float(jnp.finfo(jnp.float32).eps)
    floor = max(tol, 8.0 * eps * math.sqrt(n_pad))
    total_sq = np.asarray(jnp.sum(A * A, axis=(1, 2)))  # per-matrix, as in eigh_batched
    coarse_budget = max(1, max_sweeps // 2)
    sweep = 0
    prev_off = None
    for high_prec in (False, True):
        loop_tol = max(1e-3, floor) if not high_prec else floor
        budget = coarse_budget if not high_prec else max_sweeps
        while sweep < budget:
            # Donated (A, W): each sweep reuses the previous buffers.
            A, W, off_v = _jacobi_one_sweep(
                A, W, block_size, inner_sweeps, False, high_prec, pivot
            )
            sweep += 1
            off = np.asarray(off_v)
            if verbose:
                rel = float(np.max(np.sqrt(off / total_sq)))
                print(
                    f"  jacobi sweep {sweep} ({'fine' if high_prec else 'coarse'}):"
                    f" rel off-norm {rel:.3e}",
                    flush=True,
                )
            if bool(np.all(off <= (loop_tol * loop_tol) * total_sq)):
                break
            if high_prec and prev_off is not None and bool(
                np.all(off >= 0.9 * prev_off)
            ):
                break  # fp32 rotation floor: sweeps no longer help
            prev_off = off if high_prec else None
    # Heavier drift at large n: scale NS polish steps with the accumulated
    # sweep count (measured at 14336: one step left 3.9e-3 orthogonality,
    # three steps reach the fp32 floor).
    ns_steps = 3 if n_pad >= 4096 else 1
    evals, vecs = _jacobi_polish(A0, A, W, n, ns_steps)
    return (
        evals.reshape(batch_shape + (n,)),
        vecs.reshape(batch_shape + (n, n)),
    )


def _is_memory_error(exc: Exception) -> bool:
    message = str(exc)
    return any(
        key in message
        for key in ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory", "OOM")
    )


def eigh_large(
    matrices, _device_solver=None, on_result=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Llama-scale eigendecomposition: host-side results, host fp64 LAPACK
    fallback per matrix. Matches the reference's GPU->CPU retry
    (kronfluence/factor/eigen.py:199-213).

    `KF_LARGE_EIGH_BLOCK` overrides the sweep block size (default 128 —
    measured 5.6x faster than 32 at 14336^2, see micro_eigh_llama.py).
    `KF_LARGE_EIGH_BATCH` (jacobi route only, default 1) solves that many
    matrices per batched sweep program. Measured 2026-08-21 at 14336^2 x2:
    block 32 crashed the TPU worker outright (not a clean RESOURCE_EXHAUSTED
    the fallback chain can catch); block 128 ran green but ~neutral (76 s/
    matrix vs 72.5 single — the big-block sweeps are compute-bound). Opt-in;
    measure with micro_eigh_llama.py --batch on your backend first. A
    batched-solve RESOURCE_EXHAUSTED drops back to per-matrix solves, then
    per-matrix host LAPACK.
    `on_result(i, evals, evecs)` fires as each matrix's host-side result
    lands — the crash-checkpoint hook for hour-scale runs.

    The memory protocol is shaped by the first recorded 8B-shape run
    (2026-08-19, rc=1 after 6460 s): the whole (6, 14336, 14336) group lived
    on device while each solve added its workspace, the device solve OOMed,
    and then the fallback's `np.asarray(A[i])` *slice* needed a fresh 822 MB
    device buffer and RESOURCE_EXHAUSTED a second time, killing the run. So:

      (a) the full batch is fetched to host FIRST (the insurance copy exists
          before any device allocation can fail),
      (b) each device attempt uploads exactly ONE matrix, and its buffers die
          before the next matrix starts,
      (c) results accumulate host-side — eigenvectors of a 14336 group are
          ~5 GB, which must not ride along on a 16 GB chip through the
          remaining solves.

    Device solver selection (KF_LARGE_EIGH_SOLVER in {"jacobi", "qdwh",
    "dc", "host"}; "host" skips device attempts entirely): the default is
    the blocked-Jacobi solver — MEASURED 2026-08-19 on the real 14336^2
    Llama gate_proj covariance, it is the ONLY solver that runs at this
    dimension on a 16 GB chip. Both XLA's stock QDWH and the spectral-D&C
    path fail at COMPILE time with permanent out-of-memory errors (the
    compiler schedules 46.57 GB / 43.21 GB HBM peaks respectively;
    benchmarks/micro_eigh_llama.py records both).

    Args:
        matrices: (..., n, n) symmetric (jax or numpy), n >= LARGE_EIGH_DIM.
        _device_solver: test hook; replaces the per-matrix device eigh.

    Returns:
        (eigenvalues, eigenvectors) as HOST numpy float32 arrays.
    """
    batch_shape = tuple(matrices.shape[:-2])
    n = matrices.shape[-1]
    host_A = np.asarray(matrices, dtype=np.float32).reshape((-1, n, n))
    solver_name = os.environ.get("KF_LARGE_EIGH_SOLVER", "jacobi").lower()
    # Block size 128 measured 5.6x faster than 32 at 14336^2 (72.5 s vs
    # 407 s steady, same residual/orthogonality, 8 sweeps vs 15; 256 is
    # only ~10% better still; benchmarks/micro_eigh_llama.py 2026-08-21).
    # Fewer, deeper rounds amortize each round's batched pivot-eigh chain.
    _blk = int(os.environ.get("KF_LARGE_EIGH_BLOCK", "128"))
    if _device_solver is not None:
        solve = _device_solver
    elif solver_name == "host":
        solve = None
    elif solver_name == "jacobi":

        def solve(M):
            # Host-driven sweep loop: bounded per-sweep dispatches (the
            # single-program eigh_batched faults at Llama dims — its
            # convergence while_loop runs minutes on-device and the tunneled
            # backend kills long dispatches).
            ev, vec = eigh_jacobi_hostloop(M[None], block_size=_blk)
            return ev[0], vec[0]

    elif solver_name == "dc":
        from kronfluence_tpu.ops.eigh_dc import eigh_spectral_dc

        def _host_split_fallback(M):
            # Failed D&C splits must NOT hit eigh_spectral_dc's default
            # fallback (an eager jnp.linalg.eigh on the full matrix): at
            # Llama dims that triggers the giant QDWH compile/workspace this
            # whole path exists to avoid. Solve the split host-side instead.
            ev64, vec64 = np.linalg.eigh(np.asarray(M, np.float64))
            return jnp.asarray(ev64.astype(np.float32)), jnp.asarray(
                vec64.astype(np.float32)
            )

        def solve(M):
            ev, vec = eigh_spectral_dc(M[None], _fallback=_host_split_fallback)
            return ev[0], vec[0]
    else:  # "qdwh"
        f = _stock_eigh_jit()

        def solve(M):
            ev, vec = f(M[None])
            return ev[0], vec[0]

    # Host-solve projection, calibrated on this box (1-core LAPACK, real
    # 14336^2 covariance, 2026-08-19): dsyevd 677 s, ssyevd 583 s. Scales
    # ~n^3. Warn up front when the host route will take hours — the user may
    # prefer a device solver or coarser module partitions.
    host_dtype = np.dtype(
        os.environ.get("KF_LARGE_EIGH_HOST_DTYPE", "float64")
    )
    per_matrix_s = (677.0 if host_dtype == np.float64 else 583.0) * (n / 14336.0) ** 3
    if solve is None:
        projected = per_matrix_s * host_A.shape[0]
        if projected > 3600.0:
            import logging

            logging.getLogger("kronfluence_tpu").warning(
                "eigh_large host route: %d matrices of dim %d project to "
                "~%.1f h of single-core LAPACK (%s; ~%.0f s each, calibrated "
                "2026-08-19). KF_LARGE_EIGH_SOLVER=jacobi keeps the solve on "
                "the device; KF_LARGE_EIGH_HOST_DTYPE=float32 is ~1.16x "
                "faster at ~3e-8 eigenvalue relerr vs fp64.",
                host_A.shape[0], n, projected / 3600.0, host_dtype.name,
                per_matrix_s,
            )

    import logging
    import time as _time

    from kronfluence_tpu.utils.logger import get_logger

    _log = get_logger("kronfluence_tpu.ops.eigh", level=logging.INFO)
    X = host_A.shape[0]
    batch_k = 1
    if solve is not None and _device_solver is None and solver_name == "jacobi":
        batch_k = max(1, int(os.environ.get("KF_LARGE_EIGH_BATCH", "1")))
    ev_parts, vec_parts = [], []
    i = 0
    while i < X:
        k = min(batch_k, X - i)
        t_mat = _time.time()
        got = None  # ((k, n), (k, n, n)) host fp32
        # Memory protocol (b): the previous iteration's device buffers must
        # be dead before this iteration's upload — clear every device
        # reference (input AND results) in all paths, including the
        # batched-OOM retry, or the retry re-uploads on top of the failed
        # chunk's still-referenced buffers.
        dev = ev = vec = None
        if solve is not None and k > 1:
            try:
                dev = jnp.asarray(host_A[i : i + k])
                ev, vec = eigh_jacobi_hostloop(dev, block_size=_blk)
                jax.block_until_ready((ev, vec))
                got = (
                    np.asarray(ev, dtype=np.float32),
                    np.asarray(vec, dtype=np.float32),
                )
            except Exception as exc:  # noqa: BLE001 — re-raised unless memory-related
                if not _is_memory_error(exc):
                    raise
                logging.getLogger("kronfluence_tpu").warning(
                    "eigh_large: batched solve of %d matrices (dim %d) "
                    "exhausted device memory; retrying one matrix at a time.",
                    k, n,
                )
                batch_k = 1
                dev = ev = vec = None
                continue
            finally:
                dev = ev = vec = None
        elif solve is not None:
            try:
                dev = jnp.asarray(host_A[i])
                ev, vec = solve(dev)
                # Force completion with host fetches: on tunneled backends
                # block_until_ready can return before device errors surface,
                # and a RESOURCE_EXHAUSTED escaping this try would skip the
                # host fallback. The fetch also IS the result handoff (c).
                jax.block_until_ready((ev, vec))
                got = (
                    np.asarray(ev, dtype=np.float32)[None],
                    np.asarray(vec, dtype=np.float32)[None],
                )
            except Exception as exc:  # noqa: BLE001 — re-raised unless memory-related
                if not _is_memory_error(exc):
                    raise
                logging.getLogger("kronfluence_tpu").warning(
                    "eigh_large: device solve of matrix %d/%d (dim %d) "
                    "exhausted device memory; falling back to host %s LAPACK "
                    "(~%.0f s single-core).",
                    i + 1, X, n, host_dtype.name, per_matrix_s,
                )
            finally:
                dev = ev = vec = None
        if got is None:
            evh, vech = np.linalg.eigh(host_A[i].astype(host_dtype))
            got = (evh.astype(np.float32)[None], vech.astype(np.float32)[None])
            k = 1
        for j in range(k):
            ev_parts.append(got[0][j])
            vec_parts.append(got[1][j])
            if on_result is not None:
                on_result(i + j, got[0][j], got[1][j])
        # Multi-minute solves: per-chunk progress so hour-scale runs are
        # observable (stderr-visible via the rank-gated logger).
        _log.info(
            "eigh_large: matrices %d-%d/%d (dim %d) solved in %.1f s",
            i + 1, i + k, X, n, _time.time() - t_mat,
        )
        i += k
    evals = np.stack(ev_parts).reshape(batch_shape + (n,))
    vecs = np.stack(vec_parts).reshape(batch_shape + (n, n))
    return evals, vecs


def eigh_batched(
    matrices: jax.Array,
    block_size: int = 32,
    inner_sweeps: int = 2,
    max_sweeps: int = 16,
    tol: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """Batched symmetric eigendecomposition, ascending eigenvalues.

    Args:
        matrices: (..., n, n) symmetric (fp32 recommended on TPU).
        block_size: outer Jacobi block size b; pivot subproblems are 2b x 2b.
        inner_sweeps: scalar-Jacobi sweeps per pivot solve (approximate solves
            are fine; the outer iteration absorbs the residual).
        max_sweeps: outer sweep cap for the convergence while-loop.
        tol: relative off-diagonal Frobenius tolerance for early exit.

    Returns:
        (eigenvalues (..., n), eigenvectors (..., n, n)) with
        A ~= V @ diag(w) @ V^T, columns of V are eigenvectors.
    """
    batch_shape = matrices.shape[:-2]
    n = matrices.shape[-1]
    A = matrices.reshape((-1, n, n)).astype(jnp.float32)

    if n <= 2 * block_size:
        # Single pivot block: scalar Jacobi handles it directly (pad to even).
        m = n + (n % 2)
        return _small_eigh(A, m, n, batch_shape, inner_sweeps, max_sweeps, tol)

    # Bound peak HBM: the solver holds ~8 live (n, n) tensors per matrix, so
    # large batches of large matrices are processed in chunks.
    budget_elems = 64_000_000  # ~2 GB fp32 across the ~8-tensor live set
    chunk = max(1, min(A.shape[0], budget_elems // (n * n)))
    from kronfluence_tpu.ops.pallas.jacobi import jacobi_works

    use_pallas = jacobi_works()
    ev_parts, vec_parts = [], []
    for start in range(0, A.shape[0], chunk):
        ev, vec = _padded_blocked_eigh(
            A[start : start + chunk], n, block_size, inner_sweeps, max_sweeps, tol,
            use_pallas,
        )
        ev_parts.append(ev)
        vec_parts.append(vec)
    evals = jnp.concatenate(ev_parts, axis=0) if len(ev_parts) > 1 else ev_parts[0]
    vecs = jnp.concatenate(vec_parts, axis=0) if len(vec_parts) > 1 else vec_parts[0]
    return (
        evals.reshape(batch_shape + (n,)),
        vecs.reshape(batch_shape + (n, n)),
    )


def _padded_blocked_eigh(A, n, block_size, inner_sweeps, max_sweeps, tol, use_pallas=False):
    two_b = 2 * block_size
    n_pad = int(math.ceil(n / two_b) * two_b)
    if n_pad != n:
        # Pad with a scaled identity block that sorts above the true spectrum.
        bound = jnp.max(jnp.sum(jnp.abs(A), axis=2), axis=1)  # Gershgorin
        pad_val = 4.0 * bound + 1.0
        big = jnp.zeros((A.shape[0], n_pad, n_pad), jnp.float32)
        big = big.at[:, :n, :n].set(A)
        pad_diag = jnp.arange(n, n_pad)
        big = big.at[:, pad_diag, pad_diag].set(pad_val[:, None])
        A = big
    evals, vecs = _blocked_jacobi_eigh(A, block_size, inner_sweeps, max_sweeps, tol)
    return evals[:, :n], vecs[:, :n, :n]


@partial(jax.jit, static_argnames=("m", "n", "batch_shape", "inner_sweeps", "max_sweeps"))
def _small_eigh(A, m, n, batch_shape, inner_sweeps, max_sweeps, tol):
    x = A.shape[0]
    if m != n:
        bound = jnp.max(jnp.sum(jnp.abs(A), axis=2), axis=1)
        big = jnp.zeros((x, m, m), jnp.float32)
        big = big.at[:, :n, :n].set(A)
        big = big.at[:, n, n].set(4.0 * bound + 1.0)
        A = big
    eps = float(jnp.finfo(A.dtype).eps)
    V = _scalar_jacobi(A, inner_sweeps * max_sweeps, eps)
    D = jnp.einsum("xji,xjk,xkl->xil", V, A, V, precision=jax.lax.Precision.HIGHEST)
    evals = jnp.diagonal(D, axis1=1, axis2=2)
    order = jnp.argsort(evals, axis=1)
    evals = jnp.take_along_axis(evals, order, axis=1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=2)
    return (
        evals[:, :n].reshape(batch_shape + (n,)),
        V[:, :n, :n].reshape(batch_shape + (n, n)),
    )
