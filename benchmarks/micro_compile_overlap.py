"""Does the remote XLA compile server parallelize? (cold-start experiment)

The GPT-2 bench's cold run pays ~650 s of one-time compiles, dominated by the
three QDWH eigh programs (~415 s sequential). If the backend compiles
distinct programs concurrently, warming them on threads while earlier stages
execute would cut the cold-start wall-clock by minutes.

This script compiles N distinct eigh shapes sequentially vs on N threads and
prints both wall-clocks. Run on a COLD cache (set JAX_COMPILATION_CACHE_DIR
elsewhere or pass --no-cache) for a meaningful answer.

Usage: python benchmarks/micro_compile_overlap.py [--dims 769,1537,2304]
                                                  [--mode seq|par|both]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="769,1537,2304")
    ap.add_argument("--mode", default="both", choices=["seq", "par", "both"])
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent cache (default off: compile "
                         "timing needs cold programs)")
    args = ap.parse_args()
    dims = [int(d) for d in args.dims.split(",")]

    if args.cache:
        from kronfluence_tpu.utils.platform import enable_persistent_cache

        enable_persistent_cache(
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    def make(n, seed):
        @jax.jit
        def gen(key):
            g = jax.random.normal(key, (2, 2 * n, n), jnp.float32)
            return jnp.einsum("xti,xtj->xij", g, g,
                              preferred_element_type=jnp.float32) / (2 * n)

        out = gen(jax.random.PRNGKey(seed))
        jax.block_until_ready(out)
        return out

    mats = {n: make(n, n) for n in dims}

    def compile_one(n):
        t0 = time.time()
        # AOT compile only — no execution, so threads don't contend for the
        # device itself.
        fn = jax.jit(jnp.linalg.eigh)
        fn.lower(mats[n]).compile()
        return time.time() - t0

    if args.mode in ("seq", "both"):
        t0 = time.time()
        for n in dims:
            dt = compile_one(n)
            log(f"  seq compile n={n}: {dt:.1f}s")
        log(f"sequential total: {time.time() - t0:.1f}s")

    if args.mode in ("par", "both"):
        # distinct shapes from the sequential pass (n+1) so nothing is cached
        if args.mode == "both":
            dims = [n + 1 for n in dims]
            mats.update({n: make(n, n) for n in dims})
        times = {}

        def worker(n):
            times[n] = compile_one(n)

        t0 = time.time()
        threads = [threading.Thread(target=worker, args=(n,)) for n in dims]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        for n in dims:
            log(f"  par compile n={n}: {times[n]:.1f}s")
        log(f"parallel wall: {wall:.1f}s (sum {sum(times.values()):.1f}s)")


if __name__ == "__main__":
    main()
