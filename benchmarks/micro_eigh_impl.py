"""A/Bs `jax.lax.linalg.eigh` implementations on the production dim groups.

JAX 0.9 exposes `implementation={qdwh, jacobi, qr}`. The production solver
(ops/eigh.py:eigh_stock_batched) uses the default (QDWH spectral D&C on TPU),
which costs minutes of compile per shape (80-250 MB executables) and runs the
(24, 3073) group in ~11-14 s. This script measures compile + steady for each
implementation and batch-chunk size on the real merged GPT-2 groups
((60,769), (12,2304), (24,3073) — factor/eigen.py:_merge_dim_groups), plus
accuracy vs fp64 LAPACK, to pick the fastest correct dispatch.

Usage: python benchmarks/micro_eigh_impl.py [qdwh|jacobi|qr|all]
                                            [--groups 769,2304,3073]
                                            [--chunks 5,12,24]
Timings to stderr. Run as the only TPU process.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


GROUPS = {769: 60, 2304: 12, 3073: 24}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("impl", nargs="?", default="all",
                    choices=["qdwh", "jacobi", "qr", "all"])
    ap.add_argument("--groups", default="769,2304,3073")
    ap.add_argument("--chunks", default="")
    args = ap.parse_args()
    impls = ["jacobi", "qdwh"] if args.impl == "all" else [args.impl]
    dims = [int(d) for d in args.groups.split(",")]

    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.lax.linalg import eigh as lax_eigh
    from jax._src.lax.linalg import EighImplementation

    impl_enum = {
        "qdwh": EighImplementation.QDWH,
        "jacobi": EighImplementation.JACOBI,
        "qr": EighImplementation.QR,
    }

    log(f"devices: {jax.devices()}")

    def make_psd(x, n, seed):
        # Generated ON DEVICE: the gram of a (2n, n) Gaussian is ~3e12 FLOPs
        # at n=3073 x 24 — minutes on this host's 2 vCPUs, milliseconds on
        # the MXU.
        @jax.jit
        def gen(key):
            g = jax.random.normal(key, (x, 2 * n, n), jnp.float32)
            return jnp.einsum(
                "xti,xtj->xij", g, g,
                preferred_element_type=jnp.float32) / (2 * n)

        return gen(jax.random.PRNGKey(seed))

    for n in dims:
        x = GROUPS.get(n, 12)
        mats = make_psd(x, n, n)
        jax.block_until_ready(mats)
        # fp64 ground truth on one matrix for the accuracy check.
        ref_ev = np.linalg.eigvalsh(np.asarray(mats[0], np.float64))
        chunks = ([int(c) for c in args.chunks.split(",")] if args.chunks
                  else [x])
        for impl in impls:
            for chunk in chunks:
                if chunk > x:
                    continue

                # lax.linalg.eigh returns (eigenvectors, eigenvalues) — the
                # reverse of jnp.linalg.eigh.
                fn = jax.jit(lambda m, impl=impl_enum[impl]: lax_eigh(
                    m, implementation=impl, symmetrize_input=False)[::-1])
                try:
                    t0 = time.time()
                    ev, vec = fn(mats[:chunk])
                    jax.block_until_ready((ev, vec))
                    np.asarray(ev[:1])
                    compile_s = time.time() - t0
                except Exception as exc:  # noqa: BLE001
                    log(f"  n={n} {impl} chunk={chunk}: FAILED {type(exc).__name__}: "
                        f"{str(exc)[:200]}")
                    continue
                t0 = time.time()
                outs = []
                for s in range(0, x, chunk):
                    part = mats[s:s + chunk]
                    if part.shape[0] < chunk:
                        pad = chunk - part.shape[0]
                        part = jnp.concatenate(
                            [part, jnp.broadcast_to(
                                jnp.eye(n, dtype=part.dtype), (pad, n, n))])
                    outs.append(fn(part))
                jax.block_until_ready(outs)
                np.asarray(outs[-1][0][:1])
                steady = time.time() - t0
                ev_err = float(np.max(np.abs(
                    np.asarray(ev[0], np.float64) - ref_ev))
                    / max(1.0, np.max(np.abs(ref_ev))))
                v0 = np.asarray(vec[0], np.float64)
                orth = float(np.max(np.abs(v0.T @ v0 - np.eye(n))))
                log(f"  n={n} x={x} {impl} chunk={chunk}: compile {compile_s:.1f}s, "
                    f"steady(all {x}) {steady:.2f}s, ev_relerr {ev_err:.2e}, "
                    f"orth {orth:.2e}")


if __name__ == "__main__":
    main()
