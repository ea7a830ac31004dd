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
    FactorArguments(eigendecomposition_solver="dc")
    with _pytest.raises(ValueError):
        FactorArguments(eigendecomposition_solver="magic")


def test_jacobi_hostloop_matches_lapack():
    """The host-driven-sweep Jacobi form (the only solver that survives
    Llama-dim solves on the tunneled backend — bounded per-sweep dispatches)
    must match LAPACK like the single-program solver does."""
    import numpy as np

    from kronfluence_tpu.ops.eigh import eigh_jacobi_hostloop

    from kronfluence_tpu.ops.eigh import eigh_batched

    rng = np.random.default_rng(3)
    for n in (96, 130):  # multiple of 2b and a padded odd size
        g = rng.normal(size=(2, n, n)).astype(np.float32)
        scale = np.exp(rng.uniform(-4, 2, size=(2, n, 1))).astype(np.float32)
        a = (g * scale) @ (g * scale).transpose(0, 2, 1)
        a = 0.5 * (a + a.transpose(0, 2, 1))
        # Scalar-pivot mode is a faithful restructure of the single-program
        # solver: must reproduce it (max_sweeps matched to eigh_batched's 16).
        ev_s, vec_s = eigh_jacobi_hostloop(a, pivot="scalar", max_sweeps=16)
        ev_b, vec_b = eigh_batched(a)
        np.testing.assert_allclose(
            np.asarray(ev_s), np.asarray(ev_b), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(vec_s), np.asarray(vec_b), rtol=1e-5, atol=1e-5
        )
        # Default exact-eigh pivots: LAPACK-grade accuracy in few sweeps.
        evals, vecs = eigh_jacobi_hostloop(a)
        evals, vecs = np.asarray(evals), np.asarray(vecs)
        for i in range(a.shape[0]):
            ref = np.linalg.eigh(a[i].astype(np.float64))[0]
            scale_i = np.abs(ref).max()
            assert np.abs(evals[i] - ref).max() / scale_i < 5e-5
            recon = (vecs[i] * evals[i]) @ vecs[i].T
            assert np.abs(recon - a[i]).max() / scale_i < 1e-4
            orth = vecs[i].T @ vecs[i] - np.eye(a.shape[1])
            assert np.abs(orth).max() < 5e-5


def test_dc_solver_warns_measured_pathological(caplog):
    """Selecting the measured-pathological 'dc' solver logs a warning citing
    the recorded benchmark result (reference validation posture:
    kronfluence/arguments.py:136-156)."""
    import logging

    from kronfluence_tpu.arguments import FactorArguments

    with caplog.at_level(logging.WARNING, logger="kronfluence_tpu"):
        FactorArguments(eigendecomposition_solver="dc")
    assert any("measured-pathological" in rec.message for rec in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="kronfluence_tpu"):
        FactorArguments(eigendecomposition_solver="auto")
    assert not any("measured-pathological" in rec.message for rec in caplog.records)


def test_merged_dim_groups_match_lapack():
    """Near-miss dims (64 vs 65 = bias column analogue) share one padded
    batched eigh call; results must match per-dim LAPACK ground truth."""
    from kronfluence_tpu.factor.eigen import (
        _device_eigendecomposition,
        _merge_dim_groups,
    )
    from kronfluence_tpu.utils.constants import (
        ACTIVATION_COVARIANCE_MATRIX_NAME,
        ACTIVATION_EIGENVALUES_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
        GRADIENT_COVARIANCE_MATRIX_NAME,
        GRADIENT_EIGENVALUES_NAME,
        GRADIENT_EIGENVECTORS_NAME,
        NUM_ACTIVATION_COVARIANCE_PROCESSED,
        NUM_GRADIENT_COVARIANCE_PROCESSED,
    )

    merged = _merge_dim_groups({769: ["a"], 768: ["b"], 2304: ["c"]})
    assert set(merged) == {769, 2304}
    assert sorted(merged[769]) == [("a", 769), ("b", 768)]

    dims = {"m64": 64, "m65": 65, "m64b": 64}
    cov = {
        ACTIVATION_COVARIANCE_MATRIX_NAME: {},
        GRADIENT_COVARIANCE_MATRIX_NAME: {},
        NUM_ACTIVATION_COVARIANCE_PROCESSED: {},
        NUM_GRADIENT_COVARIANCE_PROCESSED: {},
    }
    truth = {}
    for i, (name, n) in enumerate(dims.items()):
        a = _psd_batch(1, n, seed=10 + i, ill_conditioned_first=False)[0]
        count = 3.0 + i
        cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name] = jnp.asarray(a * count)
        cov[GRADIENT_COVARIANCE_MATRIX_NAME][name] = jnp.asarray(a * count)
        cov[NUM_ACTIVATION_COVARIANCE_PROCESSED][name] = jnp.asarray([count])
        cov[NUM_GRADIENT_COVARIANCE_PROCESSED][name] = jnp.asarray([count])
        truth[name] = np.linalg.eigh(a.astype(np.float64))
    eigen = {
        key: {}
        for key in (
            ACTIVATION_EIGENVECTORS_NAME,
            ACTIVATION_EIGENVALUES_NAME,
            GRADIENT_EIGENVECTORS_NAME,
            GRADIENT_EIGENVALUES_NAME,
        )
    }
    _device_eigendecomposition(cov, eigen)
    for name, n in dims.items():
        ref_w, ref_v = truth[name]
        w = np.asarray(eigen[ACTIVATION_EIGENVALUES_NAME][name], np.float64)
        v = np.asarray(eigen[ACTIVATION_EIGENVECTORS_NAME][name], np.float64)
        assert w.shape == (n,) and v.shape == (n, n)
        scale = np.abs(ref_w).max()
        assert np.abs(w - ref_w).max() / scale < 5e-5
        a = np.asarray(
            cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name], np.float64
        ) / float(
            np.asarray(cov[NUM_ACTIVATION_COVARIANCE_PROCESSED][name])[0]
        )
        recon = (v * w) @ v.T
        assert np.abs(recon - a).max() / scale < 5e-5
        assert np.abs(v.T @ v - np.eye(n)).max() < 5e-5


@pytest.mark.tier2  # 38 s on the 1-core CI box — the slowest non-example test
def test_spectral_dc_matches_lapack():
    """Host-driven spectral divide-and-conquer (ops/eigh_dc.py) vs LAPACK:
    wide covariance-like spectrum, a tight cluster, and rank deficiency."""
    from kronfluence_tpu.ops.eigh_dc import eigh_spectral_dc

    rng = np.random.default_rng(0)
    n = 600
    cases = {}
    g = rng.standard_normal((2, n + 64, n)).astype(np.float32)
    s = np.exp(-np.linspace(0, 10, n + 64))[None, :, None].astype(np.float32)
    cov = np.einsum("xkn,xkm->xnm", g * s, g * s) + 1e-7 * np.eye(n, dtype=np.float32)
    cases["cov"] = cov
    q = np.linalg.qr(rng.standard_normal((n, n)))[0].astype(np.float32)
    w = np.concatenate([np.full(n // 2, 2.0), np.linspace(3.0, 9.0, n - n // 2)]).astype(
        np.float32
    )
    cases["cluster"] = ((q * w) @ q.T)[None]
    lr = rng.standard_normal((1, n, 64)).astype(np.float32)
    cases["lowrank"] = lr @ lr.transpose(0, 2, 1) / 64

    for name, a in cases.items():
        a = 0.5 * (a + a.transpose(0, 2, 1))
        evals, vecs = eigh_spectral_dc(jnp.asarray(a))
        evals = np.asarray(evals, np.float64)
        vecs = np.asarray(vecs, np.float64)
        for i in range(a.shape[0]):
            ref = np.linalg.eigh(a[i].astype(np.float64))[0]
            scale = max(abs(ref).max(), 1e-20)
            assert np.abs(evals[i] - ref).max() / scale < 2e-5, name
            assert np.all(np.diff(evals[i]) >= -1e-5 * scale), name
            orth = np.abs(vecs[i].T @ vecs[i] - np.eye(n)).max()
            assert orth < 2e-5, name
            recon = (vecs[i] * evals[i]) @ vecs[i].T
            assert np.abs(recon - a[i]).max() / scale < 5e-4, name


def test_spectral_dc_fallback_on_failed_split():
    """Matrices whose splits never succeed must fall back per matrix."""
    from kronfluence_tpu.ops import eigh_dc

    n = 300
    a = _psd_batch(2, n, seed=5, ill_conditioned_first=False)
    calls = []

    def fake_fallback(M):
        calls.append(1)
        import numpy as _np

        w, v = _np.linalg.eigh(_np.asarray(M, _np.float64))
        return jnp.asarray(w, jnp.float32), jnp.asarray(v, jnp.float32)

    evals, vecs = eigh_dc.eigh_spectral_dc(
        jnp.asarray(a), max_retries=0, _fallback=fake_fallback,
        _force_fail=True,
    )
    assert len(calls) == 2
    for i in range(2):
        ref = np.linalg.eigh(a[i].astype(np.float64))[0]
        assert np.abs(np.asarray(evals[i], np.float64) - ref).max() < 1e-4 * abs(ref).max()


def test_batch_chunking_consistency():
    # Force the internal batch-chunking path with a tiny budget via many mats.
    n = 80
    a = _psd_batch(5, n, seed=3, ill_conditioned_first=False)
    ev_all, _ = eigh_batched(jnp.asarray(a), block_size=16)
    ev_one, _ = eigh_batched(jnp.asarray(a[2:3]), block_size=16)
    np.testing.assert_allclose(
        np.asarray(ev_all[2]), np.asarray(ev_one[0]), rtol=1e-4, atol=1e-5
    )


def test_large_group_scratch_checkpoint(tmp_path, monkeypatch):
    """Per-matrix crash checkpoints: a rerun loads saved eigenpairs instead
    of re-solving (proven by tampering with a checkpoint and observing the
    tampered values in the rerun's output)."""
    import kronfluence_tpu.ops.eigh as eigh_mod
    from kronfluence_tpu.factor.eigen import (
        _FACTOR_PAIRS,
        _device_eigendecomposition,
    )
    from kronfluence_tpu.utils.save import load_file, save_file

    monkeypatch.setattr(eigh_mod, "LARGE_EIGH_DIM", 8)
    monkeypatch.setenv("KF_LARGE_EIGH_SOLVER", "host")
    n = 8
    rng = np.random.RandomState(0)
    cov_factors = {}
    for pair_idx, (cov_name, count_name, _evec, _eval) in enumerate(_FACTOR_PAIRS):
        a = rng.randn(2, n, n).astype(np.float32)
        mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n, dtype=np.float32)
        cov_factors[cov_name] = {f"m{i}": mats[i] for i in range(2)}
        cov_factors[count_name] = {f"m{i}": np.float32(1.0) for i in range(2)}

    def run(scratch):
        eigen = {
            name: {}
            for pair in _FACTOR_PAIRS
            for name in pair[2:]
        }
        _device_eigendecomposition(cov_factors, eigen, "jacobi", scratch)
        return eigen

    scratch = tmp_path / "scratch"
    first = run(scratch)
    ckpts = sorted(scratch.glob("*.safetensors"))
    assert len(ckpts) == 4  # 2 modules x 2 factor families
    # Accuracy of the solved path.
    eval_name = _FACTOR_PAIRS[0][3]
    ref = np.linalg.eigh(cov_factors[_FACTOR_PAIRS[0][0]]["m0"].astype(np.float64))[0]
    got = np.sort(np.asarray(first[eval_name]["m0"], np.float64))
    assert np.abs(got - ref).max() < 1e-2 * abs(ref).max()
    # Tamper with one checkpoint; the rerun must surface the tampered values.
    tampered = load_file(ckpts[0])
    tampered["evals"] = np.full_like(tampered["evals"], 7.0)
    save_file(tampered, ckpts[0])
    second = run(scratch)
    name = ckpts[0].name.split(".")[1]
    family_eval = ckpts[0].name.split(".")[0]
    assert np.allclose(np.asarray(second[family_eval][name]), 7.0)
