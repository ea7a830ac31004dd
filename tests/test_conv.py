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


@pytest.mark.parametrize("strides,padding,dilation,use_bias,groups,masked", [
    ((1, 1), "SAME", (1, 1), True, 1, False),
    ((1, 1), "SAME", (1, 1), True, 1, True),
    ((2, 1), "VALID", (1, 1), False, 1, True),
    ((1, 1), ((2, 1), (0, 2)), (1, 1), True, 2, False),
    ((2, 2), "VALID", (2, 3), True, 1, True),
])
def test_conv_sym_gram_matches_im2col_gram(strides, padding, dilation, use_bias,
                                           groups, masked):
    """The patch-free symmetric-block activation gram (conv_activation_gram)
    equals gram(flatten_activation(...)) for every conv geometry, bias, group,
    and sample-mask combination."""
    from kronfluence_tpu.capture.specs import LayerSpec
    from kronfluence_tpu.ops.covariance import conv_activation_gram, gram
    from kronfluence_tpu.ops.flatten import flatten_activation

    rng = np.random.default_rng(3)
    c_in = 6 * groups
    x = jnp.asarray(rng.normal(size=(4, 9, 11, c_in)), jnp.float32)
    valid = jnp.asarray([1, 1, 0, 1], jnp.float32) if masked else None
    spec = LayerSpec(
        name="c", kind="conv2d", has_bias=use_bias,
        in_dim=(c_in // groups) * 9, out_dim=4,
        kernel_size=(3, 3), strides=strides, padding=padding,
        kernel_dilation=dilation, feature_group_count=groups,
    )
    flat, count_ref = flatten_activation(spec, x, None, valid, jnp.float32)
    g_ref = gram(flat, jnp.float32)
    g_sym, count_sym = conv_activation_gram(spec, x, valid, jnp.float32,
                                            jnp.float32)
    assert g_sym.shape == g_ref.shape, (g_sym.shape, g_ref.shape)
    assert int(count_sym) == int(count_ref)
    scale = max(float(jnp.abs(g_ref).max()), 1e-20)
    np.testing.assert_allclose(
        np.asarray(g_sym) / scale, np.asarray(g_ref) / scale, atol=2e-6
    )


def test_conv_sym_gram_dispatch_threshold():
    """The covariance step only takes the symmetric path for wide layers
    (narrow channel blocks underfill the MXU tile)."""
    from kronfluence_tpu.capture.specs import LayerSpec
    from kronfluence_tpu.ops.covariance import use_conv_sym_gram

    def spec_for(c, k=3):
        return LayerSpec(
            name="c", kind="conv2d", has_bias=True, in_dim=c * k * k,
            out_dim=4, kernel_size=(k, k), strides=(1, 1), padding="SAME",
            kernel_dilation=(1, 1), feature_group_count=1,
        )

    assert use_conv_sym_gram(spec_for(128))
    assert use_conv_sym_gram(spec_for(512))
    assert not use_conv_sym_gram(spec_for(64))
    assert not use_conv_sym_gram(spec_for(512, k=1))


def test_conv_covariance_stage_sym_vs_im2col(monkeypatch):
    """Full covariance stage gives identical factors whether the conv
    activation gram takes the symmetric patch-free path or im2col (the
    dispatch is forced on so a small CNN exercises the former).

    A fresh PreparedModel is built for the second run (the compiled step is
    cached on the model object), and a trace-time counter proves the
    symmetric path actually ran."""
    from kronfluence_tpu.factor import covariance as cov_stage
    from kronfluence_tpu.ops import covariance as cov_ops

    model, params, task = make_cnn()
    data = make_classification_data(6)
    args = FactorArguments(
        strategy="ekfac",
        use_empirical_fisher=True,
        activation_covariance_dtype="float64",
        gradient_covariance_dtype="float64",
    )
    base = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 3), args
    )
    calls = []
    real = cov_ops.conv_activation_gram

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(cov_stage, "use_conv_sym_gram", lambda spec: True)
    monkeypatch.setattr(cov_stage, "conv_activation_gram", counting)
    model2, params2, _ = make_cnn()
    sym = fit_covariance_matrices_with_loader(
        model2, params2, task, BatchLoader(data, 3), args
    )
    assert calls, "symmetric conv gram path was not traced"
    for factor_name in base:
        for module_name in base[factor_name]:
            np.testing.assert_allclose(
                sym[factor_name][module_name],
                base[factor_name][module_name],
                rtol=1e-6, atol=1e-9, err_msg=f"{factor_name}/{module_name}",
            )


@pytest.mark.parametrize("rows,n", [(300, 700), (640, 1100), (77, 513)])
def test_pallas_syrk_matches_dense_gram(rows, n):
    """Triangle-tile syrk (interpret mode) equals the dense A^T A, including
    padding edges at non-tile-multiple shapes."""
    from kronfluence_tpu.ops.pallas.syrk import syrk

    rng = np.random.default_rng(rows + n)
    a = rng.standard_normal((rows, n)).astype(np.float32)
    g = syrk(jnp.asarray(a), tile_n=256, tile_k=256, interpret=True)
    ref = a.T @ a
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(g) / scale, ref / scale, atol=5e-6
    )
    # Exact symmetry by construction (mirrored lower triangle).
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g).T)


def test_pallas_syrk_bf16_operands():
    """bf16 operands accumulate in fp32 (the production covariance dtype)."""
    from kronfluence_tpu.ops.pallas.syrk import syrk

    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 640)).astype(np.float32)
    a16 = jnp.asarray(a, jnp.bfloat16)
    g = syrk(a16, jnp.float32, tile_n=128, tile_k=128, interpret=True)
    assert g.dtype == jnp.float32
    ref = np.asarray(a16, np.float32).T @ np.asarray(a16, np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(g) / scale, ref / scale, atol=2e-2)


def test_gram_syrk_dispatch_gating():
    """gram() only takes the Pallas path on TPU backends with wide fp32
    accumulation; on CPU it must stay on the XLA dot."""
    from kronfluence_tpu.ops.covariance import gram
    from kronfluence_tpu.ops.pallas.syrk import syrk_supported

    assert syrk_supported(2048, jnp.float32)
    assert syrk_supported(3073, jnp.float32)
    assert not syrk_supported(769, jnp.float32)   # pad waste beats savings
    assert not syrk_supported(2048, jnp.float64)  # fp64: parity paths
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((64, 2048)), jnp.float32)
    g = gram(a, jnp.float32)  # CPU backend -> XLA dot, still correct
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(a).T @ np.asarray(a), rtol=1e-4
    )


@pytest.mark.parametrize("strides,padding,dilation,use_bias,groups,masked", [
    ((1, 1), "SAME", (1, 1), True, 1, False),
    ((2, 1), "VALID", (1, 1), False, 1, True),
    ((1, 1), ((2, 1), (0, 2)), (1, 1), True, 2, False),
    ((2, 2), "VALID", (2, 3), True, 1, True),
])
def test_conv_per_sample_gradient_direct_matches_patches(
    strides, padding, dilation, use_bias, groups, masked
):
    """The patch-free vmapped conv-backprop-filter per-sample gradient equals
    the im2col psg for every conv geometry / bias / groups / mask combo."""
    from kronfluence_tpu.capture.specs import LayerSpec
    from kronfluence_tpu.ops.covariance import (
        conv_per_sample_gradient,
        per_sample_gradient,
    )
    from kronfluence_tpu.ops.flatten import (
        activation_tokens_with_bias,
        gradient_tokens,
    )

    rng = np.random.default_rng(5)
    c_in, c_out = 6 * groups, 4
    x = jnp.asarray(rng.normal(size=(4, 9, 11, c_in)), jnp.float32)
    spec = LayerSpec(
        name="c", kind="conv2d", has_bias=use_bias,
        in_dim=(c_in // groups) * 9, out_dim=c_out,
        kernel_size=(3, 3), strides=strides, padding=padding,
        kernel_dilation=dilation, feature_group_count=groups,
    )
    a_tok = activation_tokens_with_bias(spec, x, jnp.float32)
    oh_ow = a_tok.shape[1]
    dy = jnp.asarray(rng.normal(size=(4,) + _spatial_of(x, spec) + (c_out,)),
                     jnp.float32)
    assert dy.shape[1] * dy.shape[2] == oh_ow, (dy.shape, oh_ow)
    valid = jnp.asarray([1, 0, 1, 1], jnp.float32) if masked else None
    g_tok = gradient_tokens(spec, dy, valid, jnp.float32)
    ref = per_sample_gradient(a_tok, g_tok, jnp.float32)
    ours = conv_per_sample_gradient(spec, x, dy, valid, jnp.float32)
    scale = max(float(jnp.abs(ref).max()), 1e-20)
    np.testing.assert_allclose(
        np.asarray(ours) / scale, np.asarray(ref) / scale, atol=2e-6
    )


def _spatial_of(x, spec):
    from kronfluence_tpu.ops.flatten import conv2d_shift_windows

    _, (oh, ow, _) = conv2d_shift_windows(x, spec)
    return (oh, ow)


def test_conv_direct_psg_flag_end_to_end(monkeypatch):
    """With KRON_CONV_DIRECT_PSG=1, self-influence scores are identical to the
    im2col default (fresh model per run; the step cache is per-model)."""
    from kronfluence_tpu.arguments import ScoreArguments
    from kronfluence_tpu.score.self_scores import compute_self_scores_with_loaders

    data = make_classification_data(6)
    sargs = ScoreArguments(
        per_sample_gradient_dtype="float64", precondition_dtype="float64",
        score_dtype="float64",
    )
    fargs = FactorArguments(
        strategy="identity", use_empirical_fisher=True,
    )

    def run():
        model, params, task = make_cnn()
        return compute_self_scores_with_loaders(
            model, params, task, BatchLoader(data, 3), {}, fargs, sargs
        )

    base = run()
    monkeypatch.setenv("KRON_CONV_DIRECT_PSG", "1")
    direct = run()
    for key in base:
        np.testing.assert_allclose(
            np.asarray(direct[key]), np.asarray(base[key]), rtol=1e-10,
            err_msg=key,
        )
