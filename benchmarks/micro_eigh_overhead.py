"""Where do the eigh stage's non-solve seconds go?

micro_eigh_groups.py measures the three batched GPT-2 group SOLVES at ~9.1 s
steady, but the production stage (factor/eigen.py:_device_eigendecomposition)
runs ~13.5 s — ~4.4 s of assembly/split/dispatch overhead on the tunneled
backend. This script separates them by running the REAL stage twice per
variant on fabricated GPT-2-shaped covariance factors:

  stub  — the solver is monkeypatched to a trivial jitted (diag, eye) pair:
          measures everything EXCEPT the solve (assembly, chunking, split,
          dispatch round-trips, result bookkeeping).
  real  — the production QDWH path, for the total.

Usage: python benchmarks/micro_eigh_overhead.py [stub|real|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which not in ("stub", "real", "both"):
        log(f"unknown variant {which!r}\nUsage: micro_eigh_overhead.py [stub|real|both]")
        sys.exit(2)

    from kronfluence_tpu.utils.platform import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax
    import jax.numpy as jnp

    from kronfluence_tpu.arguments import FactorArguments
    from kronfluence_tpu.factor import eigen as eigen_mod
    from kronfluence_tpu.utils.constants import (
        ACTIVATION_COVARIANCE_MATRIX_NAME,
        GRADIENT_COVARIANCE_MATRIX_NAME,
        NUM_ACTIVATION_COVARIANCE_PROCESSED,
        NUM_GRADIENT_COVARIANCE_PROCESSED,
    )

    log(f"devices: {jax.devices()}")

    # GPT-2 bench factor dims: 48 modules, act (in+1) x grad out.
    dims = {"c_attn": (769, 2304), "attn_c_proj": (769, 768),
            "c_fc": (769, 3072), "mlp_c_proj": (3073, 768)}

    @jax.jit
    def fabricate(key):
        cov = {ACTIVATION_COVARIANCE_MATRIX_NAME: {},
               GRADIENT_COVARIANCE_MATRIX_NAME: {},
               NUM_ACTIVATION_COVARIANCE_PROCESSED: {},
               NUM_GRADIENT_COVARIANCE_PROCESSED: {}}
        count = jnp.asarray(4096, jnp.int32)
        for layer in range(12):
            for mod, (da, dg) in dims.items():
                name = f"h_{layer}/{mod}"
                ka, kg = jax.random.split(jax.random.fold_in(key, layer * 7 + hash(mod) % 97))
                # SPD grams in bf16, like the real factors.
                ga = jax.random.normal(ka, (da, 256), jnp.float32)
                gg = jax.random.normal(kg, (dg, 256), jnp.float32)
                cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name] = (
                    (ga @ ga.T).astype(jnp.bfloat16))
                cov[GRADIENT_COVARIANCE_MATRIX_NAME][name] = (
                    (gg @ gg.T).astype(jnp.bfloat16))
                cov[NUM_ACTIVATION_COVARIANCE_PROCESSED][name] = count
                cov[NUM_GRADIENT_COVARIANCE_PROCESSED][name] = count
        return cov

    cov = fabricate(jax.random.PRNGKey(0))
    jax.block_until_ready(cov)

    def force(tree):
        jax.block_until_ready(tree)
        leaf = jax.tree_util.tree_leaves(tree)[0]
        float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    factor_args = FactorArguments(strategy="ekfac")
    factor_args.eigendecomposition_dtype = "float32"

    def run(label):
        t0 = time.time()
        force(eigen_mod.perform_eigendecomposition(cov, factor_args))
        log(f"  {label} warm: {time.time() - t0:.1f}s")
        t0 = time.time()
        force(eigen_mod.perform_eigendecomposition(cov, factor_args))
        log(f"  {label} steady: {time.time() - t0:.2f}s")

    if which in ("stub", "both"):
        from kronfluence_tpu.ops import eigh as eigh_mod

        real_solver = eigh_mod.eigh_stock_batched

        def stub(matrices, budget_elems=None):
            @jax.jit
            def trivial(m):
                x, n = m.shape[0], m.shape[-1]
                ev = jnp.ones((x, n), jnp.float32)
                vec = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (x, n, n))
                return ev, vec

            return trivial(matrices)

        eigh_mod.eigh_stock_batched = stub
        try:
            log("stub solver (overhead only):")
            run("stub")
        finally:
            eigh_mod.eigh_stock_batched = real_solver
    if which in ("real", "both"):
        log("real QDWH solver (total):")
        run("real")


if __name__ == "__main__":
    main()
