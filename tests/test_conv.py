"""Conv2d capture + factor correctness (im2col path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.factor.covariance import (
    fit_covariance_matrices_with_loader,
    train_loss_forward,
)
from kronfluence_tpu.ops.covariance import per_sample_gradient as psg_op
from kronfluence_tpu.ops.flatten import activation_tokens_with_bias, gradient_tokens
from kronfluence_tpu.utils.dataset import BatchLoader

from tests.testable_tasks.classification import make_classification_data, make_cnn


@pytest.mark.parametrize("use_bias", [True, False])
def test_conv_per_sample_gradients_match_oracle(use_bias):
    model, params, task = make_cnn(use_bias=use_bias)
    data = make_classification_data(5)
    batch = {"x": jnp.asarray(data["x"]), "y": jnp.asarray(data["y"])}

    def run(params, batch):
        forward = train_loss_forward(
            model, task, params, batch, sample=False, rng=jax.random.PRNGKey(0)
        )
        _, captures = capture(forward, model.tracked_names)
        out = {}
        for name, cap in captures.items():
            a_tok = activation_tokens_with_bias(cap.spec, cap.activations[0], jnp.float64)
            g_tok = gradient_tokens(cap.spec, cap.output_gradients[0], None, jnp.float64)
            out[name] = psg_op(a_tok, g_tok, jnp.float64)
        return out

    psg = jax.jit(run)(params, batch)

    def single(params, x, y):
        one = {"x": x[None], "y": y[None]}
        return task.compute_train_loss(one, model.bind(params))

    oracle = jax.vmap(jax.grad(single), in_axes=(None, 0, 0))(
        params, batch["x"], batch["y"]
    )

    for name, ours in psg.items():
        g = oracle[name]
        kernel = np.asarray(g["kernel"])
        arr = np.asarray(ours)
        if kernel.ndim == 5:  # (b, kh, kw, cin, out)
            expected = kernel.transpose(0, 4, 3, 1, 2).reshape(
                kernel.shape[0], kernel.shape[4], -1
            )
        else:  # dense (b, in, out)
            expected = kernel.transpose(0, 2, 1)
        if "bias" in g:
            bias = np.asarray(g["bias"])[:, :, None]
            expected = np.concatenate([expected, bias], axis=-1)
        np.testing.assert_allclose(arr, expected, rtol=1e-8, atol=1e-10,
                                   err_msg=name)


@pytest.mark.parametrize("batch_size", [2, 5])
def test_conv_covariance_batch_invariance(batch_size):
    model, params, task = make_cnn()
    data = make_classification_data(5)
    args = FactorArguments(
        strategy="ekfac",
        use_empirical_fisher=True,
        activation_covariance_dtype="float64",
        gradient_covariance_dtype="float64",
    )
    base = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 5), args
    )
    other = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, batch_size), args
    )
    for factor_name in base:
        for module_name in base[factor_name]:
            np.testing.assert_allclose(
                base[factor_name][module_name],
                other[factor_name][module_name],
                rtol=1e-6,
                atol=1e-9,
            )


@pytest.mark.parametrize("strides,padding,dilation", [
    ((1, 1), "SAME", (1, 1)),
    ((2, 2), "SAME", (1, 1)),
    ((2, 1), "VALID", (1, 1)),
    ((1, 1), ((2, 1), (0, 2)), (1, 1)),
    ((1, 1), "SAME", (2, 2)),
    ((2, 2), "VALID", (2, 3)),
])
def test_patch_extraction_matches_xla_reference(strides, padding, dilation):
    """Slice-based im2col equals conv_general_dilated_patches for every
    (stride, padding, dilation) combination — same values, same channel-major
    feature ordering."""
    import jax

    from kronfluence_tpu.capture.specs import LayerSpec
    from kronfluence_tpu.ops.flatten import extract_conv2d_patches

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 5)))
    spec = LayerSpec(
        name="c", kind="conv2d", has_bias=True, in_dim=5 * 9, out_dim=4,
        kernel_size=(3, 3), strides=strides, padding=padding,
        kernel_dilation=dilation, feature_group_count=1,
    )
    ours = extract_conv2d_patches(x, spec)
    ref = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(3, 3), window_strides=strides, padding=padding,
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = ref.reshape(ref.shape[0], -1, ref.shape[-1])
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=0, atol=0)
