"""Scaled low-precision query-block storage (`query_gradient_storage_dtype`).

TPU extension with no reference analogue: the pairwise stage's resident query
block is stored in float8 with one scale per (query, module), halving the
stage's largest HBM resident (ops/quantize.py). These tests check the
quantization op's error bounds, that the plumbing flows through every score
path (hoisted, per-token, post-process, aggregated-train, accumulation), and
that fp8-stored scores stay highly correlated with exact ones — the same kind
of certificate the reference publishes for its bf16 recipe
(reference examples/wikitext/README.md:97).

Fidelity caveat, by design: scores are inner products with heavy cancellation
when factors are near-singular and damping is tiny; fp8's ~3% per-element
noise is then amplified. The pipeline tests therefore run the realistic
heuristic damping (damping_factor=None -> 0.1 * mean eigenvalue, reference
utils/constants.py:22) rather than the 1e-8 used by the exact-parity tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.arguments import ScoreArguments
from kronfluence_tpu.ops.quantize import (
    QuantizedGradient,
    dequantize_gradient,
    quantize_gradient,
)
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.utils.constants import ALL_MODULE_NAME
from kronfluence_tpu.utils.dataset import BatchLoader

from tests.test_scores import FP64_SCORE, _fit_factors
from tests.testable_tasks.regression import (
    RegressionTask,
    make_mlp,
    make_regression_data,
)


def _pearson(a, b):
    a, b = np.ravel(a), np.ravel(b)
    return float(np.corrcoef(a, b)[0, 1])


@pytest.fixture(scope="module")
def setup():
    model, params, task = make_mlp()
    train = make_regression_data(40, seed=0)
    query = make_regression_data(5, seed=1)
    factors, factor_args = _fit_factors(model, params, task, train)
    return model, params, task, train, query, factors, factor_args


def _scores(setup_tuple, task=None, qbs=4, tbs=5, **score_kwargs):
    model, params, default_task, train, query, factors, factor_args = setup_tuple
    score_args = ScoreArguments(damping_factor=None, **FP64_SCORE, **score_kwargs)
    return compute_pairwise_scores_with_loaders(
        model, params, task or default_task,
        BatchLoader(query, qbs), BatchLoader(train, tbs),
        factors, factor_args, score_args,
    )


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    # Wildly varying magnitudes across queries: per-query scaling must absorb
    # them (a single global scale would crush the small-magnitude queries).
    psg = rng.normal(size=(4, 6, 7)).astype(np.float32)
    psg *= np.asarray([1e-6, 1e-2, 1.0, 1e4], np.float32)[:, None, None]
    q = quantize_gradient(jnp.asarray(psg), jnp.float8_e4m3fn)
    assert q.data.dtype == jnp.float8_e4m3fn
    assert q.scale.shape == (4, 1, 1)
    back = np.asarray(q.dequantize(jnp.float32))
    # e4m3 keeps ~3 mantissa bits -> relative error <= 2^-3 per element, and
    # per-query scaling makes the bound magnitude-independent.
    rel = np.abs(back - psg) / np.maximum(np.abs(psg), 1e-30)
    assert rel.max() < 0.0725, rel.max()


def test_quantize_zero_block_is_exact():
    q = quantize_gradient(jnp.zeros((2, 3, 3), jnp.float32), jnp.float8_e4m3fn)
    assert np.asarray(q.scale).tolist() == [[[1.0]], [[1.0]]]
    np.testing.assert_array_equal(np.asarray(q.dequantize(jnp.float32)), 0.0)


def test_dequantize_passthrough_for_plain_values():
    x = jnp.ones((2, 2))
    assert dequantize_gradient(x, jnp.float32) is x
    pair = (jnp.ones((1, 2, 3)), jnp.ones((1, 3, 4)))
    assert dequantize_gradient(pair, jnp.float32) is pair


def test_quantized_gradient_is_a_pytree():
    q = quantize_gradient(jnp.ones((2, 3, 3), jnp.float32), jnp.float8_e4m3fn)
    leaves, treedef = jax.tree_util.tree_flatten(q)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, QuantizedGradient)
    out = jax.jit(lambda g: g.dequantize(jnp.float32).sum())(q)
    assert np.isfinite(float(out))


def test_invalid_storage_dtype_rejected():
    with pytest.raises(ValueError, match="query_gradient_storage_dtype"):
        ScoreArguments(query_gradient_storage_dtype="int8")


def test_concat_quantized_is_exact():
    """Merging quantized chunks along the query axis keeps each query's own
    scale — dequantization must match the per-chunk dequantizations exactly."""
    from kronfluence_tpu.ops.quantize import concat_quantized

    rng = np.random.default_rng(0)
    chunks = [
        quantize_gradient(
            jnp.asarray(rng.standard_normal((q, 4, 3)) * 10.0 ** rng.integers(-3, 3),
                        jnp.float32),
            jnp.float8_e4m3fn,
        )
        for q in (2, 3, 1)
    ]
    merged = concat_quantized(chunks)
    assert merged.shape == (6, 4, 3)
    expect = np.concatenate([np.asarray(c.dequantize(jnp.float32)) for c in chunks])
    np.testing.assert_array_equal(np.asarray(merged.dequantize(jnp.float32)), expect)


def test_collect_blocks_merges_quantized_keeps_dense_separate():
    """The block collector merges quantized chunks into one full-block GEMM
    operand but leaves dense chunks chunked (concatenating dense chunks would
    transiently double the stage's largest resident)."""
    from kronfluence_tpu.score.pairwise import _collect_blocks

    dense = [jnp.ones((2, 4, 3)), jnp.ones((2, 4, 3))]
    quant = [
        quantize_gradient(jnp.ones((2, 4, 3), jnp.float32), jnp.float8_e4m3fn)
        for _ in range(2)
    ]
    out = _collect_blocks([
        {"dense_mod": dense[0], "quant_mod": quant[0]},
        {"dense_mod": dense[1], "quant_mod": quant[1]},
    ])
    assert len(out["dense_mod"]) == 2
    assert len(out["quant_mod"]) == 1
    assert isinstance(out["quant_mod"][0], QuantizedGradient)
    assert out["quant_mod"][0].shape == (4, 4, 3)


def test_fp8_scores_track_exact_scores(setup):
    exact = _scores(setup)[ALL_MODULE_NAME]
    fp8 = _scores(setup, query_gradient_storage_dtype="float8_e4m3fn")[ALL_MODULE_NAME]
    assert fp8.shape == exact.shape
    assert _pearson(exact, fp8) > 0.99
    rel = np.linalg.norm(fp8 - exact) / np.linalg.norm(exact)
    assert rel < 0.1, rel


def test_bf16_storage_is_tighter_than_fp8(setup):
    exact = _scores(setup)[ALL_MODULE_NAME]
    bf16 = _scores(setup, query_gradient_storage_dtype="bfloat16")[ALL_MODULE_NAME]
    fp8 = _scores(setup, query_gradient_storage_dtype="float8_e4m3fn")[ALL_MODULE_NAME]
    err = lambda x: np.linalg.norm(x - exact) / np.linalg.norm(exact)
    assert err(bf16) < err(fp8)
    assert err(bf16) < 0.01, err(bf16)


def test_fp8_storage_with_accumulation_and_per_token(setup):
    """Accumulated blocks hold a list of quantized chunks; the per-token path
    consumes them through _chunk_score rather than the hoisted-psg path."""
    exact = _scores(
        setup, qbs=2,
        query_gradient_accumulation_steps=2, compute_per_token_scores=True,
    )[ALL_MODULE_NAME]
    fp8 = _scores(
        setup, qbs=2,
        query_gradient_accumulation_steps=2, compute_per_token_scores=True,
        query_gradient_storage_dtype="float8_e4m3fn",
    )[ALL_MODULE_NAME]
    assert fp8.shape == exact.shape
    assert _pearson(exact, fp8) > 0.99


def test_fp8_storage_with_post_process(setup):
    class ScaledTask(RegressionTask):
        enable_post_process_per_sample_gradient = True

        def post_process_per_sample_gradient(self, module_name, gradient):
            return gradient * 2.0

    scaled = ScaledTask()
    exact = _scores(setup, task=scaled)[ALL_MODULE_NAME]
    fp8 = _scores(
        setup, task=scaled, query_gradient_storage_dtype="float8_e4m3fn"
    )[ALL_MODULE_NAME]
    assert _pearson(exact, fp8) > 0.99


def test_fp8_storage_with_aggregated_train(setup):
    exact = _scores(setup, aggregate_train_gradients=True)[ALL_MODULE_NAME]
    fp8 = _scores(
        setup, aggregate_train_gradients=True,
        query_gradient_storage_dtype="float8_e4m3fn",
    )[ALL_MODULE_NAME]
    assert fp8.shape == exact.shape
    assert _pearson(exact, fp8) > 0.99


def test_fp8_storage_through_scanned_train_loop(setup):
    """Device-resident train stores route through the lax.scan superstep
    (utils/scan_loop.py — the bench's path); quantized blocks must flow
    through it as jit arguments identically to the per-batch path."""
    model, params, task, train, query, factors, factor_args = setup
    dev_train = {k: jnp.asarray(v) for k, v in train.items()}
    score_args = ScoreArguments(
        damping_factor=None, query_gradient_storage_dtype="float8_e4m3fn",
        **FP64_SCORE,
    )
    scanned = compute_pairwise_scores_with_loaders(
        model, params, task,
        BatchLoader(query, 4), BatchLoader(dev_train, 5),
        factors, factor_args, score_args,
    )[ALL_MODULE_NAME]
    per_batch = _scores(setup, query_gradient_storage_dtype="float8_e4m3fn")[
        ALL_MODULE_NAME
    ]
    np.testing.assert_allclose(scanned, per_batch, rtol=1e-6, atol=1e-8)


def test_quantized_blocks_barriered_in_scanned_loop(setup):
    """Quantized query chunks must be tied to the loop iteration with an
    optimization barrier inside the train step: without it, XLA's while-loop
    LICM hoists every module's dequantize out of the scanned train loop
    (utils/scan_loop.py), materializing ALL dense blocks at once on top of
    the quantized payloads — the exact OOM float8 storage exists to prevent
    (observed on the full GPT-2 bench). Dense blocks must NOT be barriered:
    hoisting their one-time cast out of the loop is the desired behavior."""
    from kronfluence_tpu.score.pairwise import _make_train_apply
    from kronfluence_tpu.utils.scan_loop import scanned_map_superstep
    from kronfluence_tpu.factor.covariance import discover_stage_specs

    model, params, task, train, query, factors, factor_args = setup
    probe = {k: jnp.asarray(v[:5]) for k, v in train.items()}
    specs = discover_stage_specs(model, task, params, probe, None)

    def block(storage_dtype):
        out = {}
        for name, spec in specs.items():
            psg = jnp.full(
                (4, spec.out_dim, spec.in_dim + int(spec.has_bias)),
                0.5,
                jnp.float32,
            )
            out[name] = [
                quantize_gradient(psg, storage_dtype) if storage_dtype else psg
            ]
        return out

    apply = _make_train_apply(model, task, None, ScoreArguments(), False)
    superstep = scanned_map_superstep(
        lambda b, v, p, qb: apply(p, b, v, qb), 5
    )
    cols = {k: jnp.asarray(v) for k, v in train.items()}
    starts = np.zeros(2, np.int32)
    nvalids = np.full(2, 5, np.int32)
    quant_text = superstep.lower(
        cols, starts, nvalids, params, block("float8_e4m3fn")
    ).as_text()
    dense_text = superstep.lower(
        cols, starts, nvalids, params, block(None)
    ).as_text()
    assert "optimization_barrier" in quant_text
    assert "optimization_barrier" not in dense_text


def test_computer_strips_storage_dtype_for_aggregated_or_low_rank(tmp_path):
    """Analyzer-level flag validation: storage dtype is dropped (with a
    warning) when the block is already small (aggregated / low-rank)."""
    from kronfluence_tpu import Analyzer

    model, params, task = make_mlp()
    analyzer = Analyzer("strip", model, task, params=params, output_dir=str(tmp_path))
    for kw in (
        dict(aggregate_query_gradients=True),
        dict(query_gradient_low_rank=2),
    ):
        args = ScoreArguments(query_gradient_storage_dtype="float8_e4m3fn", **kw)
        validated = analyzer._validate_pairwise_flags(args)
        assert validated.query_gradient_storage_dtype is None
        # Caller's arguments never mutated.
        assert args.query_gradient_storage_dtype == "float8_e4m3fn"
    plain = ScoreArguments(query_gradient_storage_dtype="float8_e4m3fn")
    assert (
        analyzer._validate_pairwise_flags(plain).query_gradient_storage_dtype
        == "float8_e4m3fn"
    )


def test_low_rank_ignores_storage_dtype(setup):
    """Low-rank compression takes precedence; storage dtype must not break it."""
    lr = _scores(
        setup,
        query_gradient_low_rank=2, use_full_svd=True,
        query_gradient_storage_dtype="float8_e4m3fn",
    )[ALL_MODULE_NAME]
    exact = _scores(setup)[ALL_MODULE_NAME]
    assert _pearson(exact, lr) > 0.9
