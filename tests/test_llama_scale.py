"""Llama-architecture capture + Llama-scale machinery (VERDICT round-1 #5).

The reference's largest workload is Llama-3-8B MLP-only factor fitting
(reference examples/openwebtext/fit_factors.py:82-88): module partitions,
iterative lambda aggregation, and fp64 eigendecomposition of up-to-14k^2
factors with an OOM retry (reference kronfluence/factor/eigen.py:199-213).
Here: the Llama architecture (RMSNorm/RoPE/GQA/SwiGLU) is exercised against
the dense-gradient oracle, the partitioned extreme-memory recipe matches the
plain fit, and the large-dim eigendecomposition fallback chain
(device -> host fp64) is verified. Real-shape execution (d_model 4096,
d_mlp 14336) runs on TPU via examples/openwebtext/fit_factors.py --arch llama
and is gated here behind KRON_LLAMA_SCALE=1.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu import Analyzer, FactorArguments, prepare_model
from kronfluence_tpu.factor.covariance import train_loss_forward
from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.models.llama import (
    LlamaConfig,
    LlamaLM,
    mlp_tracked_modules,
    tiny_llama_config,
)
from kronfluence_tpu.utils.constants import (
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    LAMBDA_MATRIX_NAME,
)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.openwebtext.task import LlamaMLPOnlyTask


def _make_llama(num_layers=2, dtype=jnp.float64):
    config = tiny_llama_config(num_layers=num_layers, dtype=dtype, param_dtype=dtype)
    module = LlamaLM(config)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, config.max_seq_len), jnp.int32)
    )["params"]
    task = LlamaMLPOnlyTask(num_layers)
    return module, params, task, config


def _make_data(n, config, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, config.vocab_size, size=(n, config.max_seq_len))
    mask = np.ones((n, config.max_seq_len), dtype=np.int32)
    lengths = rng.integers(config.max_seq_len // 2, config.max_seq_len + 1, size=(n,))
    for i, L in enumerate(lengths):
        mask[i, L:] = 0
        ids[i, L:] = 0
    return {"input_ids": ids.astype(np.int32), "attention_mask": mask}


def test_llama_capture_matches_oracle():
    """SwiGLU per-sample gradients from trace capture == vmap(grad) oracle
    (gate and up branches read the SAME activation; down reads their product)."""
    module, params, task, config = _make_llama()
    model = prepare_model(module, task)
    data = _make_data(4, config)
    batch = {k: jnp.asarray(v) for k, v in data.items()}

    def run(params, batch):
        forward = train_loss_forward(
            model, task, params, batch, sample=False, rng=jax.random.PRNGKey(0)
        )
        _, captures = capture(forward, model.tracked_names)
        from kronfluence_tpu.score.common import module_per_sample_gradients

        return {
            name: module_per_sample_gradients(cap, None, jnp.float64)
            for name, cap in captures.items()
        }

    psg = jax.jit(run)(params, batch)
    assert sorted(psg) == sorted(mlp_tracked_modules(config.num_layers))

    def single(params, ids, mask):
        one = {"input_ids": ids[None], "attention_mask": mask[None]}
        return task.compute_train_loss(one, model.bind(params))

    oracle = jax.vmap(jax.grad(single), in_axes=(None, 0, 0))(
        params, batch["input_ids"], batch["attention_mask"]
    )
    for i in range(config.num_layers):
        for proj in ("gate_proj", "up_proj", "down_proj"):
            name = f"layers_{i}/mlp/{proj}"
            expected = np.asarray(
                oracle[f"layers_{i}"]["mlp"][proj]["kernel"]
            ).transpose(0, 2, 1)
            np.testing.assert_allclose(
                np.asarray(psg[name]), expected, rtol=1e-7, atol=1e-10, err_msg=name
            )


def test_llama_partitioned_extreme_memory_recipe_matches_plain(tmp_path):
    """The reference 8B recipe (module partitions + data partitions + iterative
    lambda + remat) must produce identical factors to the plain fit."""
    from kronfluence_tpu.utils.common.factor_arguments import (
        extreme_reduce_memory_factor_arguments,
    )

    module, params, task, config = _make_llama()
    model = prepare_model(module, task)
    train = _make_data(12, config)

    plain_args = FactorArguments(
        strategy="ekfac", use_empirical_fisher=True,
        activation_covariance_dtype="float64", gradient_covariance_dtype="float64",
        per_sample_gradient_dtype="float64", lambda_dtype="float64",
        eigendecomposition_dtype="float64",
    )
    recipe_args = extreme_reduce_memory_factor_arguments(
        strategy="ekfac", module_partitions=2
    )
    # fp64 dtypes for exact comparison; keep the recipe's structure flags.
    for f in ("activation_covariance_dtype", "gradient_covariance_dtype",
              "per_sample_gradient_dtype", "lambda_dtype"):
        setattr(recipe_args, f, "float64")
    recipe_args.eigendecomposition_dtype = "float64"
    recipe_args.amp_dtype = None
    recipe_args.use_empirical_fisher = True
    recipe_args.covariance_data_partitions = 2
    recipe_args.lambda_data_partitions = 2
    assert recipe_args.use_iterative_lambda_aggregation
    assert recipe_args.offload_activations_to_cpu

    analyzer = Analyzer("llama", model, task, params=params,
                        output_dir=str(tmp_path), disable_tqdm=True)
    analyzer.fit_all_factors("plain", train, per_device_batch_size=6,
                             factor_args=plain_args)
    analyzer.fit_all_factors("recipe", train, per_device_batch_size=6,
                             factor_args=recipe_args)
    plain_cov = analyzer.load_covariance_matrices("plain")
    recipe_cov = analyzer.load_covariance_matrices("recipe")
    plain_lam = analyzer.load_lambda_matrices("plain")
    recipe_lam = analyzer.load_lambda_matrices("recipe")
    for name in mlp_tracked_modules(config.num_layers):
        np.testing.assert_allclose(
            np.asarray(recipe_cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name]),
            np.asarray(plain_cov[ACTIVATION_COVARIANCE_MATRIX_NAME][name]),
            rtol=1e-9, atol=1e-12, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(recipe_lam[LAMBDA_MATRIX_NAME][name]),
            np.asarray(plain_lam[LAMBDA_MATRIX_NAME][name]),
            rtol=1e-7, atol=1e-10, err_msg=name,
        )


def test_eigh_large_matches_lapack():
    from kronfluence_tpu.ops.eigh import eigh_large

    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, 48, 16)).astype(np.float32)
    M = A @ A.transpose(0, 2, 1) / 16 + 0.01 * np.eye(48, dtype=np.float32)
    evals, vecs = eigh_large(jnp.asarray(M))
    ref_vals = np.linalg.eigvalsh(M.astype(np.float64))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=1e-4, atol=1e-5)
    recon = np.einsum("bij,bj,bkj->bik", np.asarray(vecs), np.asarray(evals),
                      np.asarray(vecs))
    np.testing.assert_allclose(recon, M, rtol=1e-3, atol=1e-4)


def test_eigh_large_batched_solve(monkeypatch):
    """KF_LARGE_EIGH_BATCH>1 solves chunks through one batched sweep program;
    per-matrix on_result callbacks fire in order (the crash-checkpoint hook),
    and results match LAPACK."""
    from kronfluence_tpu.ops.eigh import eigh_large

    monkeypatch.setenv("KF_LARGE_EIGH_BATCH", "2")
    rng = np.random.default_rng(7)
    A = rng.standard_normal((5, 48, 16)).astype(np.float32)
    M = A @ A.transpose(0, 2, 1) / 16 + 0.01 * np.eye(48, dtype=np.float32)
    seen = []
    evals, vecs = eigh_large(
        jnp.asarray(M), on_result=lambda i, ev, vec: seen.append(i)
    )
    assert seen == [0, 1, 2, 3, 4]
    ref_vals = np.linalg.eigvalsh(M.astype(np.float64))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=1e-4, atol=1e-5)
    recon = np.einsum("bij,bj,bkj->bik", np.asarray(vecs), np.asarray(evals),
                      np.asarray(vecs))
    np.testing.assert_allclose(recon, M, rtol=1e-3, atol=1e-4)


def test_eigh_large_host_fallback_on_oom():
    """Device OOM per matrix -> host fp64 LAPACK, matching the reference's
    GPU->CPU eigendecomposition retry semantics."""
    from kronfluence_tpu.ops.eigh import eigh_large

    rng = np.random.default_rng(1)
    A = rng.standard_normal((2, 32, 32)).astype(np.float32)
    M = A @ A.transpose(0, 2, 1) / 32 + 0.01 * np.eye(32, dtype=np.float32)
    calls = []

    def exploding(_):
        calls.append(1)
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 822083584 bytes")

    evals, vecs = eigh_large(jnp.asarray(M), _device_solver=exploding)
    assert len(calls) == 2  # every matrix attempted on device first
    ref_vals = np.linalg.eigvalsh(M.astype(np.float64))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=1e-5, atol=1e-6)

    def unrelated(_):
        raise RuntimeError("INVALID_ARGUMENT: something else broke")

    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        eigh_large(jnp.asarray(M), _device_solver=unrelated)


def test_large_dim_routing():
    """Dims >= LARGE_EIGH_DIM route through eigh_large in the stage driver."""
    from kronfluence_tpu.factor import eigen as eigen_mod
    from kronfluence_tpu.ops import eigh as eigh_mod

    assert eigh_mod.LARGE_EIGH_DIM <= 14336  # Llama MLP factor dim must route large
    assert eigh_mod.LARGE_EIGH_DIM > 4096   # GPT-2-class dims stay on the batched path


def test_large_group_never_assembled_on_device(monkeypatch):
    """Large-dim factor groups are eigendecomposed one matrix at a time with
    host-resident results — `_assemble_group` must never see them (the first
    recorded 8B-shape run died because the whole 14336 group plus solver
    workspace plus results lived on device at once)."""
    from kronfluence_tpu.factor import eigen as eigen_mod
    from kronfluence_tpu.ops import eigh as eigh_mod
    from kronfluence_tpu.utils.constants import (
        ACTIVATION_EIGENVALUES_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
        GRADIENT_COVARIANCE_MATRIX_NAME,
        GRADIENT_EIGENVECTORS_NAME,
        NUM_ACTIVATION_COVARIANCE_PROCESSED,
        NUM_GRADIENT_COVARIANCE_PROCESSED,
    )

    monkeypatch.setattr(eigh_mod, "LARGE_EIGH_DIM", 48)
    real_assemble = eigen_mod._assemble_group

    def guarded(mats, counts, target, sizes):
        assert target < 48, f"large group ({target}) reached _assemble_group"
        return real_assemble(mats, counts, target, sizes)

    monkeypatch.setattr(eigen_mod, "_assemble_group", guarded)

    rng = np.random.default_rng(3)
    cov = {
        ACTIVATION_COVARIANCE_MATRIX_NAME: {},
        NUM_ACTIVATION_COVARIANCE_PROCESSED: {},
        GRADIENT_COVARIANCE_MATRIX_NAME: {},
        NUM_GRADIENT_COVARIANCE_PROCESSED: {},
    }
    for name, (da, dg) in {"big": (64, 24), "small": (16, 12)}.items():
        for key, count_key, d in (
            (ACTIVATION_COVARIANCE_MATRIX_NAME, NUM_ACTIVATION_COVARIANCE_PROCESSED, da),
            (GRADIENT_COVARIANCE_MATRIX_NAME, NUM_GRADIENT_COVARIANCE_PROCESSED, dg),
        ):
            A = rng.standard_normal((d, d)).astype(np.float32)
            cov[key][name] = jnp.asarray(A @ A.T / d + 0.01 * np.eye(d, dtype=np.float32))
            cov[count_key][name] = jnp.asarray(np.float32(2.0))

    eigen = {
        ACTIVATION_EIGENVECTORS_NAME: {}, ACTIVATION_EIGENVALUES_NAME: {},
        GRADIENT_EIGENVECTORS_NAME: {},
        eigen_mod.GRADIENT_EIGENVALUES_NAME: {},
    }
    eigen_mod._device_eigendecomposition(cov, eigen, solver="jacobi")

    # The 64-dim activation factor went through the per-matrix host path.
    big_vec = eigen[ACTIVATION_EIGENVECTORS_NAME]["big"]
    assert isinstance(big_vec, np.ndarray)  # host-resident result
    M = np.asarray(cov[ACTIVATION_COVARIANCE_MATRIX_NAME]["big"], np.float64) / 2.0
    ref = np.linalg.eigvalsh(0.5 * (M + M.T))
    np.testing.assert_allclose(
        np.asarray(eigen[ACTIVATION_EIGENVALUES_NAME]["big"], np.float64),
        ref, rtol=1e-4, atol=1e-5,
    )
    # Small dims still used the batched device path (and got assembled).
    assert eigen[ACTIVATION_EIGENVECTORS_NAME]["small"].shape == (16, 16)


@pytest.mark.skipif(
    not os.environ.get("KRON_LLAMA_SCALE"),
    reason="real-shape 8B-class run; TPU-only, set KRON_LLAMA_SCALE=1",
)
def test_llama_real_shapes_on_tpu(tmp_path):
    """d_model 4096 / d_mlp 14336, 2 layers, MLP-only: factor fit within HBM
    + 14336^2 eigendecomposition (driver: examples/openwebtext/fit_factors.py
    --arch llama). Executed manually on the TPU; see examples/openwebtext/README."""
    import subprocess

    repo = Path(__file__).resolve().parents[1]
    result = subprocess.run(
        [sys.executable, str(repo / "examples/openwebtext/fit_factors.py"),
         "--arch", "llama", "--num_layers", "2", "--d_model", "4096",
         "--d_mlp", "14336", "--num_heads", "32", "--num_kv_heads", "8",
         "--seq_len", "512", "--vocab", "8192", "--num_train", "32",
         "--per_device_batch_size", "2", "--module_partitions", "3",
         "--data_partitions", "1", "--output_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=3600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
