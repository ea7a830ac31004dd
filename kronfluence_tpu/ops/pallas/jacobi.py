"""Pallas TPU kernel: batched scalar-Jacobi diagonalization of pivot blocks.

The hot inner loop of the blocked Jacobi eigensolver (ops/eigh.py) runs
`sweeps * (m-1)` rotation rounds over a batch of m x m pivot blocks. In
plain XLA every round re-reads and re-writes the whole batch through HBM
(~180k round trips for GPT-2's factor set), leaving the VPU >100x idle.
This kernel keeps each tile of pivot blocks resident in VMEM for the entire
diagonalization, so the per-round cost collapses to on-chip vector math.

Mosaic-friendly formulation (no gathers, matmuls, transposes, or relayouts):

  * Pairing is FIXED to adjacent indices (2k, 2k+1); rounds are sequenced by
    the Brent-Luk systolic ordering (Brent & Luk, 1985), whose inter-round
    exchange is neighbor-only — `pltpu.roll` by {1, 2, m-2} plus constant
    masks — and which visits all m(m-1)/2 pairs in m-1 rounds.
  * Rotation coefficients are computed TWICE, once per operand layout:
    keepdims reductions along lanes give (YT, m, 1) row-side c/s and along
    sublanes give (YT, 1, m) column-side c/s. The values are identical (the
    pivot blocks are symmetric); computing both avoids the lane<->sublane
    relayout of a reduced vector, which stalls the Mosaic compiler.
  * All masks are built with `broadcasted_iota` directly in their target
    3D layouts — no reshapes.
  * Rotation updates use `new_i = c_i * old_i - s_i * old_partner(i)`, where
    the per-element signed `s_i` (s for even i, -s for odd i) falls out of
    the pairwise-antisymmetric tau — one roll + fused multiply-adds per side.

Rounds run as the minor PALLAS GRID dimension with a revisited output block:
the kernel body is ONE round (long in-kernel loops over this body also blew
up Mosaic compile time), while A and V stay VMEM-resident across grid steps
(scratch buffer and revisited output block).

Interpreter mode (`interpret=True`) runs the same kernel on CPU for tests.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rotation_coeffs(diag, usum, apq_shift, axis, even, eps):
    """c, s in the layout of `diag` ((YT, m, 1) rows or (YT, 1, m) cols)."""
    m = diag.shape[axis]
    apq = usum + pltpu.roll(usum, shift=apq_shift, axis=axis)
    partner_diag = jnp.where(
        even > 0,
        pltpu.roll(diag, shift=m - 1, axis=axis),
        pltpu.roll(diag, shift=1, axis=axis),
    )
    denom = 2.0 * apq
    tau = (partner_diag - diag) / jnp.where(denom == 0.0, 1.0, denom)
    sign_tau = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = sign_tau / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    scale = (
        jnp.sqrt(jnp.abs(diag * partner_diag)) + jnp.abs(diag) + jnp.abs(partner_diag)
    )
    t = jnp.where(jnp.abs(apq) > eps * scale, t, 0.0)
    c = jax.lax.rsqrt(1.0 + t * t)
    return c, t * c


def _jacobi_kernel(s_ref, v_ref, a_scr, eps: float, unroll: int = 1):
    """`unroll` Jacobi rounds on a VMEM-resident tile of (YT, m, m) blocks."""
    yt, m, _ = s_ref.shape
    f32 = jnp.float32

    row_i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = jnp.where(row_i == col_j, 1.0, 0.0).astype(f32)
    up = jnp.where((row_i % 2 == 0) & (col_j == row_i + 1), 1.0, 0.0).astype(f32)

    sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)  # sublane index
    lan = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)  # lane index
    even_sub = (sub % 2 == 0).astype(f32)
    even_lan = (lan % 2 == 0).astype(f32)

    def masks(idx):
        # Brent-Luk seat exchange sigma: new[i] = old[sigma(i)] with
        # sigma(0)=0, sigma(2)=1, sigma(m-1)=m-2, even i>=4 -> i-2,
        # odd i<=m-3 -> i+2.
        keep = (idx == 0).astype(f32)
        one = ((idx == 2) | (idx == m - 1)).astype(f32)
        two = ((idx % 2 == 0) & (idx >= 4)).astype(f32)
        fwd = ((idx % 2 == 1) & (idx <= m - 3)).astype(f32)
        return keep, one, two, fwd

    sub_masks = masks(sub)
    lan_masks = masks(lan)

    def seat_exchange(x, axis):
        keep, one, two, fwd = sub_masks if axis == 1 else lan_masks
        return (
            keep * x
            + one * pltpu.roll(x, shift=1, axis=axis)
            + two * pltpu.roll(x, shift=2, axis=axis)
            + fwd * pltpu.roll(x, shift=m - 2, axis=axis)
        )

    def pair_swap(x, axis):
        mask = even_sub if axis == 1 else even_lan
        return jnp.where(
            mask > 0,
            pltpu.roll(x, shift=m - 1, axis=axis),
            pltpu.roll(x, shift=1, axis=axis),
        )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        a_scr[:] = s_ref[:]
        v_ref[:] = jnp.broadcast_to(jnp.eye(m, dtype=f32)[None], (yt, m, m))

    a = a_scr[:]
    v = v_ref[:]
    for _ in range(unroll):
        # Row-side coefficients, (YT, m, 1): reduce along lanes.
        diag_r = jnp.sum(a * eye, axis=2, keepdims=True)
        usum_r = jnp.sum(a * up, axis=2, keepdims=True)  # a_pq at even rows
        c_r, s_r = _rotation_coeffs(diag_r, usum_r, 1, 1, even_sub, eps)
        # Column-side coefficients, (YT, 1, m): reduce along sublanes. The
        # values are identical (a is symmetric); a_pq lands at ODD columns,
        # so the pair value propagates with the opposite shift.
        diag_c = jnp.sum(a * eye, axis=1, keepdims=True)
        usum_c = jnp.sum(a * up, axis=1, keepdims=True)  # a_pq at odd cols
        c_c, s_c = _rotation_coeffs(diag_c, usum_c, m - 1, 2, even_lan, eps)

        # tau is antisymmetric within a pair, so s already carries the
        # per-element sign: new_i = c_i * old_i - s_i * old_partner(i).
        a = c_r * a - s_r * pair_swap(a, 1)
        a = c_c * a - s_c * pair_swap(a, 2)
        a = seat_exchange(seat_exchange(a, 1), 2)
        v = c_c * v - s_c * pair_swap(v, 2)
        v = seat_exchange(v, 2)
    a_scr[:] = a
    v_ref[:] = v


_COMPILED_WORKS = None


def jacobi_works() -> bool:
    """Whether the COMPILED (non-interpret) Jacobi kernel runs correctly on
    this backend — self-probed once per process AT THE PRODUCTION SHAPE
    (m=64 pivot blocks, batch tile 64: eigh.py dispatches 2*block_size=64
    with the default batch_tile), so the probe compiles the same Mosaic
    tiling the eigh stage dispatches (persisted in the compilation cache —
    the stage would pay this compile anyway). A generic Pallas capability
    probe is not enough: this kernel additionally needs `pltpu.roll`,
    scratch buffers, and a revisited output block.

    Production runs few sweeps as approximate solves, so near-diagonality is
    not required; instead the probe checks the rotation invariants: V is
    orthogonal (catches zeroed/garbled outputs) and the off-diagonal mass
    shrinks substantially (catches no-op rotations)."""
    global _COMPILED_WORKS
    if _COMPILED_WORKS is None:
        import os

        from kronfluence_tpu.utils.platform import pallas_works

        if os.environ.get("KF_JACOBI_PALLAS", "1") in ("0", "off", "false"):
            # Kill switch: the self-probe validates the kernel at its probe
            # shape, but a Mosaic fault at an untested production shape can
            # crash the TPU worker mid-stage (observed at Llama dims) — this
            # forces the scalar-Jacobi pivot path for A/B isolation.
            _COMPILED_WORKS = False
        elif not pallas_works():
            _COMPILED_WORKS = False
        else:
            try:
                import numpy as np

                m, y = 64, 64
                rng = np.random.RandomState(0)
                base = rng.randn(y, m, m).astype(np.float32)
                s = base + np.swapaxes(base, 1, 2)
                v = np.asarray(
                    jacobi_pivot_rotations(jnp.asarray(s), sweeps=2, interpret=False)
                )
                d = np.einsum("yji,yjk,ykl->yil", v, s, v)
                eye = np.eye(m, dtype=np.float32)[None]
                off = lambda x: np.sqrt(np.sum(np.square(x - x * eye)))
                vtv = np.einsum("yji,yjk->yik", v, v)
                # 0.75: two sweeps comfortably halve the off-mass of random
                # symmetric blocks; the threshold only needs to separate
                # working rotations from no-ops (ratio ~1) or garbage (>1) —
                # orthogonality above is the strong correctness gate.
                _COMPILED_WORKS = bool(
                    np.abs(vtv - eye).max() < 1e-3
                    and off(d) < 0.75 * off(s)
                )
            except Exception:
                _COMPILED_WORKS = False
    return _COMPILED_WORKS


# Backwards-compatible alias (pre-rename).
def _compiled_kernel_works() -> bool:
    return jacobi_works()


def jacobi_pivot_rotations(
    s: jax.Array,
    sweeps: int,
    eps: Optional[float] = None,
    batch_tile: int = 64,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Diagonalizing rotations for a batch of symmetric pivot blocks.

    Args:
        s: (Y, m, m) float32 symmetric blocks (m even).
        sweeps: cyclic Jacobi sweeps; each is m-1 rotation rounds.
        eps: rotation threshold (defaults to fp32 machine eps).
        batch_tile: blocks held in VMEM per grid step.
        interpret: force interpreter mode (defaults to True off-TPU).

    Returns:
        V (Y, m, m) orthogonal with V^T s V approximately diagonal.
    """
    y, m, _ = s.shape
    assert m % 2 == 0, m
    if eps is None:
        eps = float(jnp.finfo(jnp.float32).eps)
    if interpret is None:
        interpret = not jacobi_works()

    yt = min(batch_tile, y)
    y_pad = int(math.ceil(y / yt) * yt)
    if y_pad != y:
        pad = jnp.broadcast_to(jnp.eye(m, dtype=s.dtype), (y_pad - y, m, m))
        s = jnp.concatenate([s, pad], axis=0)

    rounds = sweeps * (m - 1)
    # NOTE: unrolling >1 round per grid step cuts per-step overhead but makes
    # Mosaic compile time explode (>10 min at unroll=7); one round per step
    # compiles in ~2 min and is cached persistently.
    unroll = 1
    kernel = functools.partial(_jacobi_kernel, eps=eps, unroll=unroll)
    v = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((y_pad, m, m), jnp.float32),
        grid=(y_pad // yt, rounds // unroll),
        in_specs=[
            pl.BlockSpec((yt, m, m), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (yt, m, m), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((yt, m, m), jnp.float32)],
        interpret=interpret,
    )(s.astype(jnp.float32))
    return v[:y]
