"""Pallas TPU kernel: symmetric rank-K update (`A^T A`) over triangle tiles.

XLA lowers `gram(flat) = flat^T @ flat` (ops/covariance.py, the reference's
`torch.addmm_` accumulation, kronfluence/module/tracker/factor.py:58,93) as a
full (N, N) matmul: every (i, j) AND (j, i) output tile pays MXU work even
though the result is symmetric. BLAS fixes this with `syrk`; the MXU has no
such primitive, so this kernel enumerates only the N_t*(N_t+1)/2 lower-
triangle tile pairs in its grid — via scalar-prefetched (i, j) index arrays —
and the wrapper mirrors the strict lower triangle afterwards. For GPT-2's
large factor dims (2304-3073) that is ~0.55x the MXU FLOPs of the full
product.

Design notes:
  * Grid = (pairs, K_tiles) with K minor: the output tile's index map is
    constant along K, so it stays VMEM-resident and accumulates across the
    contraction (standard revisited-output matmul pattern).
  * The left/right operands are the SAME array with different column-tile
    index maps; tiles stream through VMEM double-buffered by the pipeline.
  * Wide (512) column tiles keep arithmetic intensity above the v5e
    HBM roofline: each column tile is re-read once per partner tile, so
    narrow tiles would make the kernel bandwidth-bound.
  * Operands can be bf16 (MXU-native); accumulation is fp32 via
    `preferred_element_type`, matching gram()'s accumulate-in-fp32 contract.

Interpreter mode (`interpret=True`) runs the same kernel on CPU for tests.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 512
_TILE_K = 512
# Below this many column tiles the triangle saves at most ~1 of 4 tile pairs
# while the zero-padding to a _TILE_N multiple wastes more than that.
_MIN_TILES = 4


def _syrk_kernel(pi_ref, pj_ref, a_ref, b_ref, out_ref):
    part = jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
    )
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = part

    @pl.when(k != 0)
    def _accumulate():
        out_ref[:] = out_ref[:] + part


def _round_up(value: int, gran: int) -> int:
    return -(-value // gran) * gran


@functools.lru_cache(maxsize=64)
def _pair_indices(n_tiles: int):
    pairs = [(i, j) for i in range(n_tiles) for j in range(i + 1)]
    pi = np.asarray([p[0] for p in pairs], np.int32)
    pj = np.asarray([p[1] for p in pairs], np.int32)
    return pi, pj


def syrk_supported(n: int, accum_dtype, tile_n: int = _TILE_N) -> bool:
    """Whether the triangle kernel is expected to beat XLA's full gram."""
    return (
        jnp.dtype(accum_dtype) == jnp.float32
        and _round_up(n, tile_n) // tile_n >= _MIN_TILES
    )


_SYRK_WORKS = None


def syrk_works() -> bool:
    """Whether the compiled syrk kernel runs CORRECTLY on this backend —
    self-probed once per process on a tiny shape and checked against the XLA
    dot. A generic Pallas capability probe is not enough: this kernel also
    needs scalar prefetch and revisited-output accumulation to compile."""
    global _SYRK_WORKS
    if _SYRK_WORKS is None:
        from kronfluence_tpu.utils.platform import pallas_works

        if not pallas_works():
            _SYRK_WORKS = False
        else:
            try:
                # rows > tile_k so the K grid has several steps: the
                # revisited-output accumulation branch (k != 0 in
                # _syrk_kernel) is exactly what a partially-capable backend
                # miscompiles, and production grams always run it
                # (rows = batch x seq). Tile sizes match production defaults.
                rows, n = 3 * _TILE_K + 64, 4 * _TILE_N
                a = (
                    jnp.arange(rows * n, dtype=jnp.float32).reshape(rows, n)
                    % 7.0
                ) - 3.0
                got = np.asarray(syrk(a, jnp.float32))
                want = np.asarray(a).T @ np.asarray(a)
                _SYRK_WORKS = bool(
                    np.allclose(got, want, rtol=1e-4, atol=1e-2 * rows)
                )
            except Exception:
                _SYRK_WORKS = False
    return _SYRK_WORKS


def syrk(
    flat: jax.Array,
    accum_dtype=jnp.float32,
    tile_n: int = _TILE_N,
    tile_k: int = _TILE_K,
    interpret: bool = False,
) -> jax.Array:
    """Returns `flat^T @ flat` (N, N) computing only lower-triangle tiles.

    Args:
        flat: (rows, N) operand (bf16 or fp32).
        accum_dtype: accumulator/output dtype (fp32 on TPU).
        tile_n / tile_k: column / contraction tile sizes (128 multiples).
        interpret: run in interpreter mode (CPU tests).
    """
    rows, n = flat.shape
    np_ = _round_up(n, tile_n)
    kp = _round_up(max(rows, tile_k), tile_k)
    a = flat
    if np_ != n or kp != rows:
        a = jnp.pad(flat, ((0, kp - rows), (0, np_ - n)))
    n_tiles = np_ // tile_n
    pi, pj = _pair_indices(n_tiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pi.size, kp // tile_k),
        in_specs=[
            pl.BlockSpec((tile_k, tile_n), lambda g, k, pi, pj: (k, pi[g])),
            pl.BlockSpec((tile_k, tile_n), lambda g, k, pi, pj: (k, pj[g])),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_n), lambda g, k, pi, pj: (pi[g], pj[g])
        ),
    )
    out = pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, np_), accum_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * kp * tile_n * tile_n * int(pi.size),
            bytes_accessed=2 * pi.size * kp * tile_n * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(pi), jnp.asarray(pj), a, a)
    # Upper-triangle tiles were never written: mask, then mirror.
    lower = jnp.tril(out)
    full = lower + jnp.tril(out, -1).T
    return full[:n, :n] if np_ != n else full
