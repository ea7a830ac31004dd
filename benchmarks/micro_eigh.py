"""Micro-benchmark: eigh stage solvers on real GPT-2 factor shapes.

Usage: python scratch_eigh_bench.py {auto|dc|jacobi} [--accuracy]
Times perform_eigendecomposition end-to-end (warmup incl. compile, then one
steady run), on synthetic PSD covariance factors with GPT-2's dim groups:
act {769 x36, 3073 x12}, grad {2304 x12, 768 x24, 3072 x12}.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.factor.eigen import perform_eigendecomposition
from kronfluence_tpu.utils.constants import (
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
    NUM_GRADIENT_COVARIANCE_PROCESSED,
)

solver = sys.argv[1] if len(sys.argv) > 1 else "auto"
check_acc = "--accuracy" in sys.argv

rng = np.random.default_rng(0)


def psd(n):
    g = rng.standard_normal((n, max(n // 2, 8))).astype(np.float32)
    # Ill-conditioned-ish spectrum like real covariances.
    scale = np.exp(rng.uniform(-6, 2, size=(n, 1))).astype(np.float32)
    m = (g * scale) @ (g * scale).T + 1e-4 * np.eye(n, dtype=np.float32)
    return m * 37.0  # un-normalized, count divides it back


blocks = 12
act_dims = {"attn": 769, "aproj": 769, "fc": 769, "mproj": 3073}
grad_dims = {"attn": 2304, "aproj": 768, "fc": 3072, "mproj": 768}

cov = {
    ACTIVATION_COVARIANCE_MATRIX_NAME: {},
    GRADIENT_COVARIANCE_MATRIX_NAME: {},
    NUM_ACTIVATION_COVARIANCE_PROCESSED: {},
    NUM_GRADIENT_COVARIANCE_PROCESSED: {},
}
for b in range(blocks):
    for mod in act_dims:
        name = f"h{b}.{mod}"
        cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name] = jnp.asarray(psd(act_dims[mod]))
        cov[GRADIENT_COVARIANCE_MATRIX_NAME][name] = jnp.asarray(psd(grad_dims[mod]))
        cov[NUM_ACTIVATION_COVARIANCE_PROCESSED][name] = jnp.asarray(37.0)
        cov[NUM_GRADIENT_COVARIANCE_PROCESSED][name] = jnp.asarray(37.0)

jax.block_until_ready(cov)
# Sync: fetch a scalar so uploads complete before timing.
float(jnp.sum(cov[ACTIVATION_COVARIANCE_MATRIX_NAME]["h0.mproj"][0]))

args = FactorArguments(eigendecomposition_solver=solver)


def force(tree):
    tot = 0.0
    for d in tree.values():
        for v in d.values():
            tot += float(jnp.sum(jnp.asarray(v).astype(jnp.float32)[..., :1]))
    return tot


print(f"solver={solver} backend={jax.default_backend()}", file=sys.stderr)
t0 = time.time()
out = perform_eigendecomposition(cov, args)
force(out)
warm = time.time() - t0
print(f"warmup (incl. compile): {warm:.1f}s", file=sys.stderr)

t0 = time.time()
out = perform_eigendecomposition(cov, args)
force(out)
steady = time.time() - t0
print(f"steady: {steady:.2f}s", file=sys.stderr)

if check_acc:
    from kronfluence_tpu.utils.constants import (
        ACTIVATION_EIGENVALUES_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
    )
    worst_res, worst_orth = 0.0, 0.0
    for name in ("h0.attn", "h0.mproj", "h5.fc"):
        A = np.asarray(cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name], np.float64) / 37.0
        A = 0.5 * (A + A.T)
        w = np.asarray(out[ACTIVATION_EIGENVALUES_NAME][name], np.float64)
        V = np.asarray(out[ACTIVATION_EIGENVECTORS_NAME][name], np.float64)
        res = np.linalg.norm(A @ V - V * w[None, :]) / np.linalg.norm(A)
        orth = np.linalg.norm(V.T @ V - np.eye(V.shape[1]))
        worst_res = max(worst_res, res)
        worst_orth = max(worst_orth, orth)
        print(f"{name}: residual={res:.2e} orth={orth:.2e}", file=sys.stderr)
    print(f"worst residual={worst_res:.2e} orth={worst_orth:.2e}", file=sys.stderr)
