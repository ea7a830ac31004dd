"""Micro-benchmark: per-dim-group eigensolver timing on GPT-2's merged groups.

The production eigendecomposition (factor/eigen.py:_device_eigendecomposition)
merges near-miss dims ACROSS both factor families, so GPT-2 dispatches exactly
three static-shape groups: (60, 769, 769) = 36 act@769 + 24 grad@768,
(24, 3073, 3073) = 12 act@3073 + 12 grad@3072, and (12, 2304, 2304). This
script times each group separately under the stock QDWH solver and the
batched blocked-Jacobi solver, to locate where the stage's steady seconds go
and whether a per-group hybrid dispatch would beat all-QDWH.

Usage: python benchmarks/micro_eigh_groups.py [qdwh|jacobi|both]
Needs the repo root AND the TPU plugin dir on PYTHONPATH.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kronfluence_tpu.utils.platform import enable_persistent_cache

enable_persistent_cache()

which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which not in ("qdwh", "jacobi", "both", "qdwh_mp"):
    print(
        f"unknown solver {which!r}\n"
        "Usage: python benchmarks/micro_eigh_groups.py "
        "[qdwh|jacobi|both|qdwh_mp]\n"
        "  qdwh_mp: QDWH under jax.default_matmul_precision('high') — "
        "bf16_3x matmul passes instead of fp32; prints eigenvalue error vs "
        "the default-precision solve.",
        file=sys.stderr,
    )
    sys.exit(2)

GROUPS = [(60, 769), (12, 2304), (24, 3073)]


def make(b, n):
    # On-device generation: the (b, n, n/2) gram is ~7e11 FLOPs at the 3073
    # group — minutes on this host's 2 vCPUs, milliseconds on the MXU.
    @jax.jit
    def gen(key):
        kg, ks = jax.random.split(key)
        g = jax.random.normal(kg, (b, n, max(n // 2, 8)), jnp.float32)
        scale = jnp.exp(jax.random.uniform(ks, (b, n, 1), minval=-6.0, maxval=2.0))
        gs = g * scale
        m = jnp.einsum("bik,bjk->bij", gs, gs, preferred_element_type=jnp.float32)
        return m + 1e-4 * jnp.eye(n, dtype=jnp.float32)

    return gen(jax.random.PRNGKey(n + b))


def bench(name, fn, A):
    t0 = time.time()
    out = fn(A)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    warm = time.time() - t0
    t0 = time.time()
    out = fn(A)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    steady = time.time() - t0
    print(f"{name}: warmup {warm:.1f}s steady {steady:.2f}s", file=sys.stderr, flush=True)
    return steady


totals = {}
for b, n in GROUPS:
    A = make(b, n)
    jax.block_until_ready(A)
    if which in ("qdwh", "both"):
        from kronfluence_tpu.ops.eigh import eigh_stock_batched

        totals.setdefault("qdwh", 0.0)
        totals["qdwh"] += bench(f"qdwh ({b},{n})", eigh_stock_batched, A)
    if which == "qdwh_mp":
        from kronfluence_tpu.ops.eigh import eigh_stock_batched

        def mp_solve(M):
            with jax.default_matmul_precision("high"):
                return eigh_stock_batched(M)

        totals.setdefault("qdwh_mp", 0.0)
        totals["qdwh_mp"] += bench(f"qdwh_mp ({b},{n})", mp_solve, A)
        ev_mp = np.asarray(mp_solve(A)[0][0], np.float64)
        ev_ref = np.asarray(eigh_stock_batched(A)[0][0], np.float64)
        rel = float(np.max(np.abs(ev_mp - ev_ref)) / max(1.0, np.max(np.abs(ev_ref))))
        print(f"  qdwh_mp ({b},{n}) eigenvalue relerr vs fp32 qdwh: {rel:.2e}",
              file=sys.stderr, flush=True)
    if which in ("jacobi", "both"):
        from kronfluence_tpu.ops.eigh import eigh_batched

        totals.setdefault("jacobi", 0.0)
        totals["jacobi"] += bench(f"jacobi ({b},{n})", eigh_batched, A)
    del A

for k, v in totals.items():
    print(f"total {k}: {v:.2f}s", file=sys.stderr, flush=True)
