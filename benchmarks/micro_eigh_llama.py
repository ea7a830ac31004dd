"""Probe: XLA's stock QDWH eigh on a single Llama-scale (14336, 14336) matrix.

`eigh_large` (ops/eigh.py) currently routes dims >= LARGE_EIGH_DIM through the
host-driven spectral D&C solver with a host-fp64-LAPACK fallback, on the
assumption that a 14336-dim QDWH is infeasible to compile on this backend.
That assumption was never measured. This script measures it: compile time,
steady solve time, and accuracy (eigh residual + orthogonality) for one
matrix, using a real saved Llama covariance when available (pass the
safetensors path) or a synthetic spread-spectrum gram otherwise.

For calibration it can also time the host-LAPACK fp64 path on the same
matrix (--host; ~10+ min single-core, which is exactly the number the
default fallback pays per matrix).

Usage:
  python benchmarks/micro_eigh_llama.py [--dim 14336] [--host] [--cov PATH KEY]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kronfluence_tpu.utils.platform import enable_persistent_cache

enable_persistent_cache()

parser = argparse.ArgumentParser()
parser.add_argument("--dim", type=int, default=14336)
parser.add_argument("--host", action="store_true", help="also time host fp64 LAPACK")
parser.add_argument(
    "--solver", default="qdwh", choices=["qdwh", "dc", "jacobi", "jacobi_host"],
    help="device solver to probe (qdwh = XLA stock eigh; MEASURED 2026-08-19: "
         "at 14336 its compile is HARD-infeasible on a 16 GB v5e — the "
         "compiler schedules a 46.57 GB HBM peak and the remote compile "
         "server returns a permanent out-of-memory error after ~9 min)",
)
parser.add_argument(
    "--cov",
    nargs=2,
    metavar=("PATH", "KEY"),
    help="safetensors file + tensor key of a real covariance to solve",
)
parser.add_argument(
    "--block_size", type=int, default=32,
    help="jacobi_host outer block size b (pivot blocks are 2b x 2b; "
         "b=32 -> 447 rounds/sweep at 14336, b=64 -> 223)",
)
parser.add_argument(
    "--batch", type=int, default=1,
    help="solve this many DIFFERENT matrices in one batched call — measures "
         "cross-matrix amortization of the per-round pivot-eigh latency "
         "chain (round-4 VERDICT item 4)",
)
args = parser.parse_args()

n = args.dim
if args.cov:
    from safetensors.numpy import load_file

    mat = load_file(args.cov[0])[args.cov[1]].astype(np.float32)
    n = mat.shape[0]
    A = jnp.asarray(0.5 * (mat + mat.T))[None]
    print(f"loaded real covariance {args.cov[1]} ({n},{n})", file=sys.stderr)
else:

    @jax.jit
    def gen(key):
        kg, ks = jax.random.split(key)
        g = jax.random.normal(kg, (n, 2048), jnp.float32)
        scale = jnp.exp(jax.random.uniform(ks, (n, 1), minval=-6.0, maxval=2.0))
        gs = g * scale
        m = gs @ gs.T
        return 0.5 * (m + m.T) + 1e-4 * jnp.eye(n, dtype=jnp.float32)

    A = jnp.stack(
        [gen(jax.random.PRNGKey(n + i)) for i in range(args.batch)]
    )
jax.block_until_ready(A)

if args.solver == "qdwh":
    from kronfluence_tpu.ops.eigh import eigh_stock_batched as _solve
elif args.solver == "dc":
    from kronfluence_tpu.ops.eigh_dc import eigh_spectral_dc as _solve
elif args.solver == "jacobi_host":
    from functools import partial as _partial

    from kronfluence_tpu.ops.eigh import eigh_jacobi_hostloop

    _solve = _partial(
        eigh_jacobi_hostloop, block_size=args.block_size, verbose=True
    )
else:
    from kronfluence_tpu.ops.eigh import eigh_batched as _solve

for label in ("warmup(compile)", "steady"):
    t0 = time.time()
    ev, vec = _solve(A)
    jax.block_until_ready((ev, vec))
    np.asarray(ev[0, :1])
    print(
        f"{args.solver}[b={args.block_size},x={A.shape[0]}] {label}: "
        f"{time.time() - t0:.1f}s",
        file=sys.stderr, flush=True,
    )


@jax.jit
def accuracy(A, ev, vec):
    # residual ||A v - v diag(ev)|| / ||A||, orthogonality ||V^T V - I||
    av = A @ vec
    vl = vec * ev[None, :]
    res = jnp.linalg.norm(av - vl) / jnp.linalg.norm(A)
    eye = vec.T @ vec - jnp.eye(A.shape[0], dtype=A.dtype)
    return res, jnp.linalg.norm(eye) / np.sqrt(A.shape[0])


res, orth = accuracy(A[0], ev[0], vec[0])
print(
    f"{args.solver} residual {float(res):.2e} orthogonality {float(orth):.2e}",
    file=sys.stderr,
)

if args.host:
    host = np.asarray(A[0], np.float64)
    t0 = time.time()
    hev, hvec = np.linalg.eigh(host)
    print(f"host fp64 LAPACK: {time.time() - t0:.1f}s", file=sys.stderr)
    rel = float(
        np.max(np.abs(np.asarray(ev[0], np.float64) - hev))
        / max(1.0, np.max(np.abs(hev)))
    )
    print(
        f"{args.solver} eigenvalue relerr vs host fp64: {rel:.2e}", file=sys.stderr
    )
