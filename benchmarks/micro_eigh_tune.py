"""Tunes the TPU QDWH-eig knobs on the dominant (24, 3073) factor group.

`jax._src.tpu.linalg.eigh.eigh` exposes two knobs the public jnp wrapper
pins: `precision` (matmul precision inside the QDWH iterations and subspace
extractions) and `termination_size` (recursion leaf size handed to the
Jacobi custom call). The (24, 3073) group is ~6.6 s of the stage's ~9.1 s
steady; this sweep measures each knob combination's compile + steady +
accuracy vs fp64 LAPACK on one matrix.

Usage: python benchmarks/micro_eigh_tune.py [--combos p,t[;p,t...]]
  p in {float32, highest, high, default}; t an int.
Defaults: float32,256 (baseline); high,256; float32,1024; high,1024.
Run as the only TPU process.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", default="base,0;float32,256;high,256;float32,1024;high,1024")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--dim", type=int, default=3073)
    args = ap.parse_args()

    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax._src.tpu.linalg import eigh as tpu_eigh

    log(f"devices: {jax.devices()}")
    b, n = args.batch, args.dim

    @jax.jit
    def gen(key):
        kg, ks = jax.random.split(key)
        g = jax.random.normal(kg, (b, n, n // 2), jnp.float32)
        scale = jnp.exp(jax.random.uniform(ks, (b, n, 1), minval=-6.0, maxval=2.0))
        gs = g * scale
        m = jnp.einsum("bik,bjk->bij", gs, gs, preferred_element_type=jnp.float32)
        return m + 1e-4 * jnp.eye(n, dtype=jnp.float32)

    mats = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(mats)
    ref_ev = np.linalg.eigvalsh(np.asarray(mats[0], np.float64))

    # vmap(tpu_eigh.eigh) crashes this backend's remote compiler (HTTP 500,
    # measured 2026-08-19); knobs are evaluated SINGLE-MATRIX instead, with a
    # single-matrix jnp.linalg.eigh baseline ("base,0") for apples-to-apples.
    # Precision must be one of the backend's enum strings.
    for combo in args.combos.split(";"):
        p_name, t_str = combo.split(",")
        term = int(t_str)

        if p_name == "base":
            fn = jax.jit(lambda m: jnp.linalg.eigh(m))
        else:
            fn = jax.jit(lambda m, p=p_name, t=term: tpu_eigh.eigh(
                m, precision=p, termination_size=t))
        try:
            t0 = time.time()
            ev, vec = fn(mats[0])
            jax.block_until_ready((ev, vec))
            np.asarray(ev[:1])
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 3
            for r in range(reps):
                ev, vec = fn(mats[r % b])
            jax.block_until_ready((ev, vec))
            np.asarray(ev[:1])
            steady = (time.time() - t0) / reps
        except Exception as exc:  # noqa: BLE001
            log(f"  {p_name},{term}: FAILED {type(exc).__name__}: {str(exc)[:160]}")
            continue
        ev0, vec0 = fn(mats[0])
        got = np.asarray(ev0, np.float64)
        rel = float(np.max(np.abs(got - ref_ev)) / max(1.0, np.max(np.abs(ref_ev))))
        v0 = np.asarray(vec0, np.float64)
        orth = float(np.max(np.abs(v0.T @ v0 - np.eye(n))))
        log(f"  {p_name},term={term}: compile {compile_s:.1f}s, steady {steady:.2f}s, "
            f"ev_relerr {rel:.2e}, orth {orth:.2e} (per matrix)")


if __name__ == "__main__":
    main()
