"""Micro-benchmark: Pallas syrk vs XLA full gram on GPT-2 covariance shapes.

Usage: python scratch_syrk_bench.py [rows]
Times, per factor dim (768/769, 2304, 3072, 3073): XLA dot gram vs Pallas
triangle syrk on bf16 operands with fp32 accumulation, looped inside one jit
(the tunneled dispatch costs ~5-10 ms per call).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kronfluence_tpu.ops.pallas.syrk import syrk

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
REPS = 20

print(f"backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)

rng = np.random.default_rng(0)


def bench(fn, x, label):
    @jax.jit
    def run(x):
        acc = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)
        for _ in range(REPS):
            acc = acc + fn(x)
        return acc

    out = run(x)  # compile + warm
    float(jnp.sum(out[:1, :1]))
    t0 = time.time()
    out = run(x)
    float(jnp.sum(out[:1, :1]))
    dt = (time.time() - t0) / REPS
    n = x.shape[1]
    flops = 2 * rows * n * n
    print(f"{label:<28} n={n:<5} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s (full-gram flops)",
          file=sys.stderr)
    return dt


def xla_gram(x):
    return jax.lax.dot_general(
        x, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


for n in (768, 769, 2304, 3072, 3073):
    x = jnp.asarray(rng.standard_normal((rows, n)), jnp.bfloat16)
    float(jnp.sum(x[:1, :1].astype(jnp.float32)))
    t_xla = bench(xla_gram, x, "xla dot_general")
    t_syrk = bench(lambda v: syrk(v, jnp.float32), x, "pallas syrk t512")
    t_syrk256 = bench(lambda v: syrk(v, jnp.float32, tile_n=256), x, "pallas syrk t256")
    best = min(t_syrk, t_syrk256)
    print(f"  -> syrk/xla speedup {t_xla / best:.2f}x", file=sys.stderr)
