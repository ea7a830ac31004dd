"""Blocked-Jacobi eigensolver (ops/eigh.py) vs fp64 LAPACK ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from kronfluence_tpu.ops.eigh import eigh_batched


def _psd_batch(x, n, seed=0, ill_conditioned_first=True):
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((x, n, n)).astype(np.float32)
    a = g @ g.transpose(0, 2, 1) / n
    if ill_conditioned_first:
        h = rng.standard_normal((n, max(1, n // 2))).astype(np.float32)
        a[0] = (h @ h.T) / n + 1e-6 * np.eye(n, dtype=np.float32)
    return 0.5 * (a + a.transpose(0, 2, 1))


@pytest.mark.parametrize("n,bs", [(5, 32), (48, 16), (129, 32), (200, 32), (384, 32)])
def test_accuracy_vs_lapack(n, bs):
    a = _psd_batch(2, n)
    evals, vecs = eigh_batched(jnp.asarray(a), block_size=bs)
    evals, vecs = np.asarray(evals, np.float64), np.asarray(vecs, np.float64)
    for i in range(a.shape[0]):
        ref = np.linalg.eigh(a[i].astype(np.float64))[0]
        scale = np.abs(ref).max()
        assert np.abs(evals[i] - ref).max() / scale < 5e-5
        # eigenvalues ascending
        assert np.all(np.diff(evals[i]) >= -1e-6 * scale)
        # orthogonality and reconstruction at fp32 level
        orth = np.abs(vecs[i].T @ vecs[i] - np.eye(n)).max()
        assert orth < 5e-5
        recon = (vecs[i] * evals[i]) @ vecs[i].T
        assert np.abs(recon - a[i]).max() / scale < 5e-5


def test_clustered_spectrum():
    n = 96
    rng = np.random.default_rng(1)
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    w = np.concatenate([np.full(n // 2, 2.0), np.linspace(3.0, 9.0, n - n // 2)])
    a = ((q * w) @ q.T).astype(np.float32)
    a = 0.5 * (a + a.T)
    evals, vecs = eigh_batched(jnp.asarray(a[None]))
    evals = np.asarray(evals[0], np.float64)
    ref = np.linalg.eigh(a.astype(np.float64))[0]
    assert np.abs(evals - ref).max() < 5e-5 * np.abs(ref).max()


def test_stock_solver_matches_lapack():
    from kronfluence_tpu.ops.eigh import eigh_stock_batched

    n = 96
    a = _psd_batch(5, n, seed=7, ill_conditioned_first=False)
    # Tiny budget forces the chunked path (5 matrices, 2 per chunk).
    evals, vecs = eigh_stock_batched(jnp.asarray(a), budget_elems=2 * n * n)
    evals, vecs = np.asarray(evals, np.float64), np.asarray(vecs, np.float64)
    for i in range(a.shape[0]):
        ref = np.linalg.eigh(a[i].astype(np.float64))[0]
        scale = np.abs(ref).max()
        assert np.abs(evals[i] - ref).max() / scale < 5e-5
        recon = (vecs[i] * evals[i]) @ vecs[i].T
        assert np.abs(recon - a[i]).max() / scale < 5e-5


def test_solver_argument_validation():
    import pytest as _pytest

    from kronfluence_tpu.arguments import FactorArguments

    FactorArguments(eigendecomposition_solver="jacobi")
    FactorArguments(eigendecomposition_solver="qdwh")
    with _pytest.raises(ValueError):
        FactorArguments(eigendecomposition_solver="magic")


def test_batch_chunking_consistency():
    # Force the internal batch-chunking path with a tiny budget via many mats.
    n = 80
    a = _psd_batch(5, n, seed=3, ill_conditioned_first=False)
    ev_all, _ = eigh_batched(jnp.asarray(a), block_size=16)
    ev_one, _ = eigh_batched(jnp.asarray(a[2:3]), block_size=16)
    np.testing.assert_allclose(
        np.asarray(ev_all[2]), np.asarray(ev_one[0]), rtol=1e-4, atol=1e-5
    )
