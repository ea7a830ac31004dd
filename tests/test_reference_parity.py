"""Numerical parity against the actual PyTorch reference implementation.

Runs the real `kronfluence` package (mounted read-only at /root/reference) on
CPU with an identical tiny MLP + identical weights/data in fp64 and asserts
that every factor artifact and the final pairwise/self scores agree within the
reference's own equivalence tolerances (tests/utils.py:45-46: rtol=1.3e-6,
atol=1e-5). This is the strongest capability-parity evidence available
without GPU hardware.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# The reference imports `einconv` (unavailable); it is only needed for
# string-padding conv math which these tests do not exercise.
if "einconv" not in sys.modules:
    einconv = types.ModuleType("einconv")
    einconv_utils = types.ModuleType("einconv.utils")

    def _unsupported(*args, **kwargs):
        raise NotImplementedError

    einconv_utils.get_conv_paddings = _unsupported
    einconv.utils = einconv_utils
    sys.modules["einconv"] = einconv
    sys.modules["einconv.utils"] = einconv_utils

# Append (not prepend): the reference repo also contains a `tests` package
# that must not shadow ours.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_kron = pytest.importorskip("kronfluence")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kronfluence_tpu import (  # noqa: E402
    Analyzer as TpuAnalyzer,
    FactorArguments as TpuFactorArguments,
    ScoreArguments as TpuScoreArguments,
    prepare_model as tpu_prepare_model,
)
from kronfluence_tpu.utils.constants import (  # noqa: E402
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    ACTIVATION_EIGENVALUES_NAME,
    ALL_MODULE_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    GRADIENT_EIGENVALUES_NAME,
    LAMBDA_MATRIX_NAME,
)

from tests.testable_tasks.regression import RegressionTask  # noqa: E402
from kronfluence_tpu.models.mlp import MLP  # noqa: E402

RTOL, ATOL = 1.3e-6, 1e-5

IN_DIM, H1, H2, OUT_DIM = 8, 16, 12, 1
NUM_TRAIN, NUM_QUERY = 16, 5


def _make_torch_model():
    torch.manual_seed(0)
    return torch.nn.Sequential(
        torch.nn.Linear(IN_DIM, H1),
        torch.nn.ReLU(),
        torch.nn.Linear(H1, H2),
        torch.nn.ReLU(),
        torch.nn.Linear(H2, OUT_DIM),
    ).double()


class TorchRegressionTask(ref_kron.Task):
    def compute_train_loss(self, batch, model, sample=False):
        x, y = batch
        preds = model(x)
        if sample:
            with torch.no_grad():
                sampled = preds.detach() + torch.randn_like(preds)
            return torch.nn.functional.mse_loss(preds, sampled, reduction="sum")
        return torch.nn.functional.mse_loss(preds, y, reduction="sum")

    def compute_measurement(self, batch, model):
        x, _ = batch
        return model(x).sum()


@pytest.fixture(scope="module")
def parity_results(tmp_path_factory):
    rng = np.random.default_rng(0)
    x_train = rng.normal(size=(NUM_TRAIN, IN_DIM))
    y_train = rng.normal(size=(NUM_TRAIN, OUT_DIM))
    x_query = rng.normal(size=(NUM_QUERY, IN_DIM))
    y_query = rng.normal(size=(NUM_QUERY, OUT_DIM))

    # ---- Reference (PyTorch, CPU, fp64) ----
    torch_model = _make_torch_model()
    torch_task = TorchRegressionTask()
    train_ds = torch.utils.data.TensorDataset(
        torch.tensor(x_train, dtype=torch.float64),
        torch.tensor(y_train, dtype=torch.float64),
    )
    query_ds = torch.utils.data.TensorDataset(
        torch.tensor(x_query, dtype=torch.float64),
        torch.tensor(y_query, dtype=torch.float64),
    )
    prepared = ref_kron.prepare_model(torch_model, torch_task)
    ref_dir = tmp_path_factory.mktemp("reference_out")
    ref_analyzer = ref_kron.Analyzer(
        "parity", prepared, torch_task, cpu=True, disable_tqdm=True,
        output_dir=str(ref_dir),
    )
    ref_factor_args = ref_kron.FactorArguments(
        strategy="ekfac",
        use_empirical_fisher=True,
        activation_covariance_dtype=torch.float64,
        gradient_covariance_dtype=torch.float64,
        eigendecomposition_dtype=torch.float64,
        per_sample_gradient_dtype=torch.float64,
        lambda_dtype=torch.float64,
    )
    ref_analyzer.fit_all_factors(
        "f", train_ds, per_device_batch_size=8, factor_args=ref_factor_args
    )
    ref_score_args = ref_kron.ScoreArguments(
        damping_factor=1e-8,
        query_gradient_svd_dtype=torch.float64,
        per_sample_gradient_dtype=torch.float64,
        precondition_dtype=torch.float64,
        score_dtype=torch.float64,
    )
    ref_analyzer.compute_pairwise_scores(
        "s", "f", query_ds, train_ds,
        per_device_query_batch_size=5, per_device_train_batch_size=8,
        score_args=ref_score_args,
    )
    ref_analyzer.compute_self_scores(
        "self", "f", train_ds, per_device_train_batch_size=8,
        score_args=ref_kron.ScoreArguments(
            damping_factor=1e-8,
            per_sample_gradient_dtype=torch.float64,
            precondition_dtype=torch.float64,
            score_dtype=torch.float64,
        ),
    )
    ref = {
        "covariance": ref_analyzer.load_covariance_matrices("f"),
        "eigen": ref_analyzer.load_eigendecomposition("f"),
        "lambda": ref_analyzer.load_lambda_matrices("f"),
        "pairwise": ref_analyzer.load_pairwise_scores("s"),
        "self": ref_analyzer.load_self_scores("self"),
    }

    # ---- TPU build (JAX, CPU, fp64), identical weights ----
    module = MLP(hidden_dims=(H1, H2), out_dim=OUT_DIM)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, IN_DIM)))["params"]
    torch_layers = [torch_model[0], torch_model[2], torch_model[4]]
    flax_names = ["layers_0", "layers_1", "output"]
    params = dict(params)
    for lname, tlayer in zip(flax_names, torch_layers):
        params[lname] = {
            "kernel": jnp.asarray(
                tlayer.weight.detach().numpy().T, dtype=jnp.float64
            ),
            "bias": jnp.asarray(tlayer.bias.detach().numpy(), dtype=jnp.float64),
        }
    jax_task = RegressionTask()
    jax_model = tpu_prepare_model(module, jax_task)
    tpu_dir = tmp_path_factory.mktemp("tpu_out")
    tpu_analyzer = TpuAnalyzer(
        "parity", jax_model, jax_task, params=params, output_dir=str(tpu_dir)
    )
    tpu_factor_args = TpuFactorArguments(
        strategy="ekfac",
        use_empirical_fisher=True,
        activation_covariance_dtype="float64",
        gradient_covariance_dtype="float64",
        eigendecomposition_dtype="float64",
        per_sample_gradient_dtype="float64",
        lambda_dtype="float64",
    )
    train_data = {"x": x_train, "y": y_train}
    query_data = {"x": x_query, "y": y_query}
    tpu_analyzer.fit_all_factors(
        "f", train_data, per_device_batch_size=8, factor_args=tpu_factor_args
    )
    tpu_score_args = TpuScoreArguments(
        damping_factor=1e-8,
        query_gradient_svd_dtype="float64",
        per_sample_gradient_dtype="float64",
        precondition_dtype="float64",
        score_dtype="float64",
    )
    tpu_analyzer.compute_pairwise_scores(
        "s", "f", query_data, train_data,
        per_device_query_batch_size=5, per_device_train_batch_size=8,
        score_args=tpu_score_args,
    )
    tpu_analyzer.compute_self_scores(
        "self", "f", train_data, per_device_train_batch_size=8,
        score_args=TpuScoreArguments(
            damping_factor=1e-8,
            per_sample_gradient_dtype="float64",
            precondition_dtype="float64",
            score_dtype="float64",
        ),
    )
    tpu = {
        "covariance": tpu_analyzer.load_covariance_matrices("f"),
        "eigen": tpu_analyzer.load_eigendecomposition("f"),
        "lambda": tpu_analyzer.load_lambda_matrices("f"),
        "pairwise": tpu_analyzer.load_pairwise_scores("s"),
        "self": tpu_analyzer.load_self_scores("self"),
    }

    # Module-name mapping: reference uses torch module paths ('0','2','4'),
    # ours uses flax paths.
    ref_names = ["0", "2", "4"]
    return ref, tpu, list(zip(ref_names, flax_names))


def _to_np(x):
    return x.detach().numpy() if hasattr(x, "detach") else np.asarray(x)


def test_covariance_parity(parity_results):
    ref, tpu, name_map = parity_results
    for factor in (ACTIVATION_COVARIANCE_MATRIX_NAME, GRADIENT_COVARIANCE_MATRIX_NAME):
        for rname, tname in name_map:
            np.testing.assert_allclose(
                _to_np(ref["covariance"][factor][rname]),
                tpu["covariance"][factor][tname],
                rtol=RTOL, atol=ATOL, err_msg=f"{factor}/{tname}",
            )


def test_eigenvalue_parity(parity_results):
    ref, tpu, name_map = parity_results
    for factor in (ACTIVATION_EIGENVALUES_NAME, GRADIENT_EIGENVALUES_NAME):
        for rname, tname in name_map:
            np.testing.assert_allclose(
                _to_np(ref["eigen"][factor][rname]),
                tpu["eigen"][factor][tname],
                rtol=RTOL, atol=ATOL, err_msg=f"{factor}/{tname}",
            )


def test_lambda_parity(parity_results):
    ref, tpu, name_map = parity_results
    for rname, tname in name_map:
        np.testing.assert_allclose(
            _to_np(ref["lambda"][LAMBDA_MATRIX_NAME][rname]),
            tpu["lambda"][LAMBDA_MATRIX_NAME][tname],
            rtol=RTOL, atol=ATOL, err_msg=tname,
        )


def test_pairwise_score_parity(parity_results):
    ref, tpu, _ = parity_results
    np.testing.assert_allclose(
        _to_np(ref["pairwise"][ALL_MODULE_NAME]),
        tpu["pairwise"][ALL_MODULE_NAME],
        rtol=RTOL, atol=ATOL,
    )


def test_self_score_parity(parity_results):
    ref, tpu, _ = parity_results
    np.testing.assert_allclose(
        _to_np(ref["self"][ALL_MODULE_NAME]),
        tpu["self"][ALL_MODULE_NAME],
        rtol=RTOL, atol=ATOL,
    )
