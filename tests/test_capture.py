"""Capture-engine correctness: per-sample gradients vs the autograd oracle.

Mirrors the reference's oracle pattern #1 (tests/modules/test_per_sample_gradients.py):
ground truth is an independent differentiation path — here `jax.vmap(jax.grad)`
over batch-size-1 losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.factor.covariance import train_loss_forward
from kronfluence_tpu.ops.covariance import per_sample_gradient as psg_op
from kronfluence_tpu.ops.flatten import activation_tokens_with_bias, gradient_tokens

from tests.testable_tasks.regression import make_mlp, make_regression_data


def capture_per_sample_gradients(model, params, task, batch, valid=None):
    def run(params, batch):
        forward = train_loss_forward(
            model, task, params, batch, sample=False, rng=jax.random.PRNGKey(0)
        )
        _, captures = capture(forward, model.tracked_names)
        out = {}
        for name, cap in captures.items():
            total = None
            for a, dy in zip(cap.activations, cap.output_gradients):
                a_tok = activation_tokens_with_bias(cap.spec, a, jnp.float64)
                g_tok = gradient_tokens(cap.spec, dy, valid, jnp.float64)
                contrib = psg_op(a_tok, g_tok, jnp.float64)
                total = contrib if total is None else total + contrib
            out[name] = total
        return out

    return jax.jit(run)(params, batch)


def oracle_per_sample_gradients(model, params, task, batch):
    def single(params, x, y):
        one = {"x": x[None], "y": y[None]}
        return task.compute_train_loss(one, model.bind(params))

    return jax.vmap(jax.grad(single), in_axes=(None, 0, 0))(
        params, batch["x"], batch["y"]
    )


@pytest.mark.parametrize("shared", [False, True])
def test_per_sample_gradients_match_oracle(shared):
    model, params, task = make_mlp(shared=shared)
    data = make_regression_data(6)
    batch = {k: jnp.asarray(v) for k, v in data.items()}

    psg = capture_per_sample_gradients(model, params, task, batch)
    oracle = oracle_per_sample_gradients(model, params, task, batch)

    flat_oracle = {}

    def walk(tree, prefix):
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, path)
            else:
                flat_oracle[path] = value

    walk(oracle, "")

    for name, ours in psg.items():
        kernel = np.asarray(flat_oracle[f"{name}/kernel"]).transpose(0, 2, 1)
        bias = np.asarray(flat_oracle[f"{name}/bias"])[:, :, None]
        expected = np.concatenate([kernel, bias], axis=-1)
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-9, atol=1e-9)


def test_padded_samples_have_zero_gradient():
    model, params, task = make_mlp()
    data = make_regression_data(4)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    psg = capture_per_sample_gradients(model, params, task, batch, valid=valid)
    for ours in psg.values():
        arr = np.asarray(ours)
        assert np.all(arr[2:] == 0.0)
        assert np.any(arr[:2] != 0.0)
