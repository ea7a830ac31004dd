"""Conv2d numerical parity against the actual PyTorch reference.

Extends tests/test_reference_parity.py to the Conv path: identical weights
and data through a two-layer CNN in fp64 must reproduce the reference's
covariance/eigen/lambda artifacts and pairwise/self scores within its own
tolerances. Verifies in particular that the im2col feature ordering
(channel-major (C, kh, kw), matching torch.nn.functional.unfold) makes conv
factor artifacts cross-framework interchangeable.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "einconv" not in sys.modules:
    einconv = types.ModuleType("einconv")
    einconv_utils = types.ModuleType("einconv.utils")

    def _unsupported(*args, **kwargs):
        raise NotImplementedError

    einconv_utils.get_conv_paddings = _unsupported
    einconv.utils = einconv_utils
    sys.modules["einconv"] = einconv
    sys.modules["einconv.utils"] = einconv_utils

if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_kron = pytest.importorskip("kronfluence")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kronfluence_tpu import (  # noqa: E402
    Analyzer as TpuAnalyzer,
    FactorArguments as TpuFactorArguments,
    ScoreArguments as TpuScoreArguments,
    Task as TpuTask,
    prepare_model as tpu_prepare_model,
)
from kronfluence_tpu.utils.constants import (  # noqa: E402
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    ALL_MODULE_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    LAMBDA_MATRIX_NAME,
)

RTOL, ATOL = 1.3e-6, 1e-5
B, C, H, W = 10, 2, 6, 6
NUM_QUERY = 4


class TorchConvTask(ref_kron.Task):
    def compute_train_loss(self, batch, model, sample=False):
        x, y = batch
        preds = model(x)
        return torch.nn.functional.mse_loss(preds, y, reduction="sum")

    def compute_measurement(self, batch, model):
        x, _ = batch
        return model(x).sum()


class JaxConvTask(TpuTask):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        return jnp.sum((preds - batch["y"]) ** 2)

    def compute_measurement(self, batch, model):
        return jnp.sum(model(batch["x"]))


class CNN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), name="conv1",
                    param_dtype=jnp.float64)(x)
        x = nn.relu(x)
        return nn.Conv(2, (3, 3), padding="VALID", name="conv2",
                       param_dtype=jnp.float64)(x)


@pytest.fixture(scope="module")
def conv_parity(tmp_path_factory):
    rng = np.random.default_rng(3)
    x_train = rng.normal(size=(B, C, H, W))          # NCHW for torch
    y_train = rng.normal(size=(B, 2, H - 2, W - 2))
    x_query = rng.normal(size=(NUM_QUERY, C, H, W))
    y_query = rng.normal(size=(NUM_QUERY, 2, H - 2, W - 2))

    torch.manual_seed(0)
    torch_model = torch.nn.Sequential(
        torch.nn.Conv2d(C, 3, 3, padding=1),
        torch.nn.ReLU(),
        torch.nn.Conv2d(3, 2, 3),
    ).double()
    torch_task = TorchConvTask()
    train_ds = torch.utils.data.TensorDataset(
        torch.tensor(x_train, dtype=torch.float64),
        torch.tensor(y_train, dtype=torch.float64),
    )
    query_ds = torch.utils.data.TensorDataset(
        torch.tensor(x_query, dtype=torch.float64),
        torch.tensor(y_query, dtype=torch.float64),
    )
    prepared = ref_kron.prepare_model(torch_model, torch_task)
    ref_analyzer = ref_kron.Analyzer(
        "conv_parity", prepared, torch_task, cpu=True, disable_tqdm=True,
        output_dir=str(tmp_path_factory.mktemp("ref_out")),
    )
    fa = ref_kron.FactorArguments(
        strategy="ekfac", use_empirical_fisher=True,
        activation_covariance_dtype=torch.float64,
        gradient_covariance_dtype=torch.float64,
        eigendecomposition_dtype=torch.float64,
        per_sample_gradient_dtype=torch.float64,
        lambda_dtype=torch.float64,
    )
    ref_analyzer.fit_all_factors("f", train_ds, per_device_batch_size=5, factor_args=fa)
    sa = ref_kron.ScoreArguments(
        damping_factor=1e-8, query_gradient_svd_dtype=torch.float64,
        per_sample_gradient_dtype=torch.float64,
        precondition_dtype=torch.float64, score_dtype=torch.float64,
    )
    ref_analyzer.compute_pairwise_scores(
        "s", "f", query_ds, train_ds,
        per_device_query_batch_size=NUM_QUERY, per_device_train_batch_size=5,
        score_args=sa,
    )
    ref = {
        "covariance": ref_analyzer.load_covariance_matrices("f"),
        "lambda": ref_analyzer.load_lambda_matrices("f"),
        "pairwise": ref_analyzer.load_pairwise_scores("s"),
    }

    # ---- TPU build: NHWC data, identical weights ----
    module = CNN()
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, C), jnp.float64)
    )["params"]
    params = dict(params)
    for fname, tlayer in zip(["conv1", "conv2"], [torch_model[0], torch_model[2]]):
        params[fname] = {
            # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
            "kernel": jnp.asarray(
                tlayer.weight.detach().numpy().transpose(2, 3, 1, 0), jnp.float64
            ),
            "bias": jnp.asarray(tlayer.bias.detach().numpy(), jnp.float64),
        }
    to_nhwc = lambda a: np.ascontiguousarray(a.transpose(0, 2, 3, 1))
    train_data = {"x": to_nhwc(x_train), "y": to_nhwc(y_train)}
    query_data = {"x": to_nhwc(x_query), "y": to_nhwc(y_query)}
    jax_task = JaxConvTask()
    tpu_analyzer = TpuAnalyzer(
        "conv_parity", tpu_prepare_model(module, jax_task), jax_task,
        params=params, output_dir=str(tmp_path_factory.mktemp("tpu_out")),
    )
    tfa = TpuFactorArguments(
        strategy="ekfac", use_empirical_fisher=True,
        activation_covariance_dtype="float64", gradient_covariance_dtype="float64",
        eigendecomposition_dtype="float64", per_sample_gradient_dtype="float64",
        lambda_dtype="float64",
    )
    tpu_analyzer.fit_all_factors("f", train_data, per_device_batch_size=5, factor_args=tfa)
    tsa = TpuScoreArguments(
        damping_factor=1e-8, query_gradient_svd_dtype="float64",
        per_sample_gradient_dtype="float64", precondition_dtype="float64",
        score_dtype="float64",
    )
    tpu_analyzer.compute_pairwise_scores(
        "s", "f", query_data, train_data,
        per_device_query_batch_size=NUM_QUERY, per_device_train_batch_size=5,
        score_args=tsa,
    )
    tpu = {
        "covariance": tpu_analyzer.load_covariance_matrices("f"),
        "lambda": tpu_analyzer.load_lambda_matrices("f"),
        "pairwise": tpu_analyzer.load_pairwise_scores("s"),
    }
    return ref, tpu, [("0", "conv1"), ("2", "conv2")]


def _to_np(x):
    return x.detach().numpy() if hasattr(x, "detach") else np.asarray(x)


def test_conv_covariance_parity(conv_parity):
    ref, tpu, names = conv_parity
    for factor in (ACTIVATION_COVARIANCE_MATRIX_NAME, GRADIENT_COVARIANCE_MATRIX_NAME):
        for ref_name, tpu_name in names:
            np.testing.assert_allclose(
                _to_np(ref["covariance"][factor][ref_name]),
                _to_np(tpu["covariance"][factor][tpu_name]),
                rtol=RTOL, atol=ATOL, err_msg=f"{factor}/{ref_name}",
            )


def test_conv_lambda_parity(conv_parity):
    ref, tpu, names = conv_parity
    for ref_name, tpu_name in names:
        np.testing.assert_allclose(
            _to_np(ref["lambda"][LAMBDA_MATRIX_NAME][ref_name]),
            _to_np(tpu["lambda"][LAMBDA_MATRIX_NAME][tpu_name]),
            rtol=RTOL, atol=ATOL, err_msg=ref_name,
        )


def test_conv_pairwise_score_parity(conv_parity):
    ref, tpu, names = conv_parity
    np.testing.assert_allclose(
        _to_np(ref["pairwise"][ALL_MODULE_NAME]),
        _to_np(tpu["pairwise"][ALL_MODULE_NAME]),
        rtol=RTOL, atol=ATOL,
    )
