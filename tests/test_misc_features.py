"""Coverage for remaining capability-parity features: raw functional models,
per-sample-gradient post-processing, BatchNorm models, encoder-decoder dict
attention masks, Analyzer utilities, and presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kronfluence_tpu.nn as knn
from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.factor.covariance import (
    fit_covariance_matrices_with_loader,
    train_loss_forward,
)
from kronfluence_tpu.factor.eigen import (
    fit_lambda_matrices_with_loader,
    perform_eigendecomposition,
)
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.constants import (
    ALL_MODULE_NAME,
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    LAMBDA_MATRIX_NAME,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
)
from kronfluence_tpu.utils.dataset import BatchLoader

from tests.testable_tasks.regression import (
    RegressionTask,
    make_mlp,
    make_regression_data,
)

FP64_FACTOR = dict(
    use_empirical_fisher=True,
    activation_covariance_dtype="float64",
    gradient_covariance_dtype="float64",
    per_sample_gradient_dtype="float64",
    lambda_dtype="float64",
)


# ---- Raw functional (non-flax) model support ----

def test_functional_model_matches_flax():
    """A raw apply-fn model using kronfluence_tpu.nn tagged ops produces the
    same factors as the equivalent flax model."""
    flax_model, params, task = make_mlp()
    data = make_regression_data(8)

    def apply_fn(p, x):
        h = knn.linear(x, p["layers_0"]["kernel"], p["layers_0"]["bias"], name="layers_0")
        h = jax.nn.relu(h)
        h = knn.linear(h, p["layers_1"]["kernel"], p["layers_1"]["bias"], name="layers_1")
        h = jax.nn.relu(h)
        return knn.linear(h, p["output"]["kernel"], p["output"]["bias"], name="output")

    func_model = prepare_model(apply_fn, task)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    base = fit_covariance_matrices_with_loader(
        flax_model, params, task, BatchLoader(data, 4), args
    )
    func = fit_covariance_matrices_with_loader(
        func_model, params, task, BatchLoader(data, 4), args
    )
    for factor_name in base:
        for mod in base[factor_name]:
            np.testing.assert_allclose(
                base[factor_name][mod], func[factor_name][mod], rtol=1e-9, atol=1e-12
            )


# ---- post_process_per_sample_gradient ----

class ScaledGradientTask(RegressionTask):
    enable_post_process_per_sample_gradient = True

    def post_process_per_sample_gradient(self, module_name, gradient):
        return gradient * 2.0


def test_post_process_per_sample_gradient_scales_lambda_and_scores():
    model, params, base_task = make_mlp()
    task = ScaledGradientTask()
    data = make_regression_data(8)
    query = make_regression_data(3, seed=1)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    loader = lambda: BatchLoader(data, 4)

    cov = fit_covariance_matrices_with_loader(model, params, base_task, loader(), args)
    eigen = perform_eigendecomposition(cov, args)
    lam_base = fit_lambda_matrices_with_loader(
        model, params, base_task, loader(), args, eigen_factors=eigen
    )
    lam_scaled = fit_lambda_matrices_with_loader(
        model, params, task, loader(), args, eigen_factors=eigen
    )
    name = sorted(lam_base[LAMBDA_MATRIX_NAME])[0]
    np.testing.assert_allclose(
        lam_scaled[LAMBDA_MATRIX_NAME][name],
        4.0 * lam_base[LAMBDA_MATRIX_NAME][name],
        rtol=1e-9,
        atol=1e-12,  # eigenbasis rotation leaves denormal-scale entries
    )

    # Pairwise: query and train gradients both scaled -> scores x4 (same factors).
    factors = {**cov, **eigen, **lam_base}
    score_args = ScoreArguments(
        damping_factor=1e-8, score_dtype="float64",
        per_sample_gradient_dtype="float64", precondition_dtype="float64",
    )
    base_scores = compute_pairwise_scores_with_loaders(
        model, params, base_task, BatchLoader(query, 3), loader(), factors, args, score_args
    )
    scaled_scores = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(query, 3), loader(), factors, args, score_args
    )
    np.testing.assert_allclose(
        scaled_scores[ALL_MODULE_NAME], 4.0 * base_scores[ALL_MODULE_NAME],
        rtol=1e-7, atol=1e-10,  # different contraction order on each path
    )


# ---- BatchNorm model (eval mode, mutable state as constants) ----

def test_batchnorm_model_capture():
    import flax.linen as nn

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8, name="fc1")(x)
            x = nn.BatchNorm(use_running_average=True, name="bn")(x)
            x = nn.relu(x)
            return nn.Dense(1, name="fc2")(x)

    module = BNNet()
    x0 = jnp.zeros((2, 4), jnp.float64)
    variables = module.init(jax.random.PRNGKey(0), x0)
    variables = jax.tree_util.tree_map(lambda p: p.astype(jnp.float64), variables)
    task = RegressionTask()
    model = prepare_model(module, task)
    data = {"x": np.random.default_rng(0).normal(size=(6, 4)),
            "y": np.random.default_rng(1).normal(size=(6, 1))}
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    # Pass full variables (params + batch_stats) as the parameter pytree.
    factors = fit_covariance_matrices_with_loader(
        model, variables, task, BatchLoader(data, 3), args
    )
    assert set(factors[ACTIVATION_COVARIANCE_MATRIX_NAME]) == {"fc1", "fc2"}


# ---- Encoder-decoder with dict attention masks ----

class Seq2SeqTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        import optax

        logits = model(
            batch["input_ids"],
            batch["decoder_input_ids"],
            batch["attention_mask"],
            batch["decoder_attention_mask"],
        )[:, :-1]
        labels = batch["decoder_input_ids"][:, 1:]
        mask = batch["decoder_attention_mask"][:, 1:].astype(logits.dtype)
        if sample:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        return jnp.sum(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels) * mask
        )

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)

    def get_attention_mask(self, batch):
        # Dict form: encoder modules get the encoder mask, decoder modules the
        # decoder mask (reference task.py:83-99).
        masks = {}
        for i in range(2):
            for sub in ("attn/q", "attn/k", "attn/v", "attn/o", "mlp/wi", "mlp/wo"):
                masks[f"encoder_{i}/{sub}"] = batch["attention_mask"]
            for sub in ("self_attn/q", "self_attn/k", "self_attn/v", "self_attn/o",
                        "cross_attn/q", "cross_attn/o", "mlp/wi", "mlp/wo"):
                masks[f"decoder_{i}/{sub}"] = batch["decoder_attention_mask"]
            for sub in ("cross_attn/k", "cross_attn/v"):
                masks[f"decoder_{i}/{sub}"] = batch["attention_mask"]
        masks["lm_head"] = batch["decoder_attention_mask"]
        return masks


def test_encoder_decoder_dict_masks():
    from kronfluence_tpu.models.encoder_decoder import EncDecConfig, EncDecLM

    config = EncDecConfig(dtype=jnp.float64, param_dtype=jnp.float64)
    module = EncDecLM(config)
    ids = jnp.zeros((1, config.max_seq_len), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids, ids)["params"]
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.float64), params)
    task = Seq2SeqTask()
    model = prepare_model(module, task)

    rng = np.random.default_rng(0)
    n, t = 6, config.max_seq_len
    enc_mask = np.ones((n, t), dtype=np.int32)
    dec_mask = np.ones((n, t), dtype=np.int32)
    enc_mask[:, t // 2 :] = 0  # encoder sequences half-length
    data = {
        "input_ids": rng.integers(1, config.vocab_size, size=(n, t)).astype(np.int32) * enc_mask,
        "decoder_input_ids": rng.integers(1, config.vocab_size, size=(n, t)).astype(np.int32),
        "attention_mask": enc_mask,
        "decoder_attention_mask": dec_mask,
    }
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    factors = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 3), args
    )
    # Encoder modules count only unmasked encoder tokens; decoder modules all.
    enc_count = int(factors[NUM_ACTIVATION_COVARIANCE_PROCESSED]["encoder_0/attn/q"][0])
    dec_count = int(factors[NUM_ACTIVATION_COVARIANCE_PROCESSED]["decoder_0/self_attn/q"][0])
    assert enc_count == int(enc_mask.sum())
    assert dec_count == int(dec_mask.sum())


# ---- Analyzer utilities / presets ----

def test_get_module_summary_and_presets(tmp_path):
    from kronfluence_tpu import Analyzer
    from kronfluence_tpu.utils.common.factor_arguments import (
        all_low_precision_factor_arguments,
        extreme_reduce_memory_factor_arguments,
        pytest_factor_arguments,
    )
    from kronfluence_tpu.utils.common.score_arguments import (
        default_score_arguments,
        fp8_query_score_arguments,
        pytest_score_arguments,
    )

    model, params, task = make_mlp()
    analyzer = Analyzer(
        "summary_test", model, task, params=params, output_dir=str(tmp_path)
    )
    data = make_regression_data(4)
    summary = None
    analyzer._layer_specs(data)
    summary = analyzer.get_module_summary()
    assert "layers_0" in summary and "output" in summary

    assert pytest_factor_arguments().use_empirical_fisher
    assert all_low_precision_factor_arguments().to_dict()["lambda_dtype"] == "bfloat16"
    extreme = extreme_reduce_memory_factor_arguments(module_partitions=4)
    assert extreme.covariance_module_partitions == 4
    assert default_score_arguments(query_gradient_low_rank=16).query_gradient_accumulation_steps == 10
    assert pytest_score_arguments().to_dict()["score_dtype"] == "float64"
    fp8 = fp8_query_score_arguments()
    assert fp8.query_gradient_storage_dtype == "float8_e4m3fn"
    assert fp8.damping_factor is None  # heuristic: the certified-0.9999 recipe
    assert fp8.score_dtype == "bfloat16"


def test_partitioned_factors_match_unpartitioned(tmp_path):
    """(data x module)-partitioned covariance/lambda aggregate identically
    (reference: tests/factors/test_covariances.py:155)."""
    from kronfluence_tpu import Analyzer

    model, params, task = make_mlp()
    data = make_regression_data(12)
    base_args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    part_args = FactorArguments(
        strategy="ekfac",
        covariance_data_partitions=2,
        covariance_module_partitions=2,
        lambda_data_partitions=3,
        lambda_module_partitions=1,
        **FP64_FACTOR,
    )
    analyzer = Analyzer("partition_test", model, task, params=params, output_dir=str(tmp_path))
    analyzer.fit_all_factors("base", data, per_device_batch_size=4, factor_args=base_args)
    analyzer.fit_all_factors("parts", data, per_device_batch_size=4, factor_args=part_args)
    base_cov = analyzer.load_covariance_matrices("base")
    part_cov = analyzer.load_covariance_matrices("parts")
    for factor_name in base_cov:
        for mod in base_cov[factor_name]:
            np.testing.assert_allclose(
                base_cov[factor_name][mod], part_cov[factor_name][mod],
                rtol=1e-8, atol=1e-10, err_msg=f"{factor_name}/{mod}",
            )
    base_lam = analyzer.load_lambda_matrices("base")
    part_lam = analyzer.load_lambda_matrices("parts")
    for mod in base_lam[LAMBDA_MATRIX_NAME]:
        np.testing.assert_allclose(
            base_lam[LAMBDA_MATRIX_NAME][mod], part_lam[LAMBDA_MATRIX_NAME][mod],
            rtol=1e-8, atol=1e-10,
        )


def test_amp_float16_loss_scaling():
    """amp_dtype=float16 + amp_scale (GradScaler analogue): factors match the
    fp32 run to fp16 tolerance, with gradients computed under loss scaling
    (reference: factor/covariance.py:218-226, tracked_module.py:272-279)."""
    import flax.linen as nn

    from kronfluence_tpu.utils.constants import GRADIENT_COVARIANCE_MATRIX_NAME

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3, name="fc", param_dtype=jnp.float32)(x)

    class T(Task):
        def compute_train_loss(self, batch, model, sample=False, rng=None):
            return jnp.sum((model(batch["x"]) - batch["y"]) ** 2)

        def compute_measurement(self, batch, model):
            return self.compute_train_loss(batch, model)

    rng = np.random.default_rng(0)
    data = {
        "x": rng.standard_normal((16, 4)).astype(np.float32),
        "y": rng.standard_normal((16, 3)).astype(np.float32),
    }
    module = M()
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(data["x"][:1]))["params"]
    task = T()
    model = prepare_model(module, task)
    base = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 8),
        FactorArguments(use_empirical_fisher=True),
    )
    amp = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 8),
        FactorArguments(
            use_empirical_fisher=True, amp_dtype="float16", amp_scale=2.0**10
        ),
    )
    a = np.asarray(base[GRADIENT_COVARIANCE_MATRIX_NAME]["fc"], np.float64)
    b = np.asarray(amp[GRADIENT_COVARIANCE_MATRIX_NAME]["fc"], np.float64)
    assert np.abs(a - b).max() / np.abs(a).max() < 2e-2


def test_score_partition_resume_reuses_artifacts(tmp_path):
    """Preemption-safe score resume (reference: score_computer.py:276-380):
    a rerun loads completed partitions from disk instead of recomputing —
    proven by planting a sentinel in a saved partition artifact and checking
    it lands in the final aggregate."""
    from kronfluence_tpu import Analyzer
    from kronfluence_tpu.computer.score_computer import pairwise_scores_save_path
    from kronfluence_tpu.utils.save import load_file, save_file

    model, params, task = make_mlp()
    data = make_regression_data(12)
    queries = make_regression_data(4, seed=5)
    factor_args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    score_args = ScoreArguments(data_partitions=2, score_dtype="float64",
                                per_sample_gradient_dtype="float64",
                                precondition_dtype="float64")
    analyzer = Analyzer("resume_test", model, task, params=params, output_dir=str(tmp_path))
    analyzer.fit_all_factors("f", data, per_device_batch_size=4, factor_args=factor_args)

    # Job 1: compute only partition 0 (the "preempted" run).
    analyzer.compute_pairwise_scores(
        "s", "f", queries, data, per_device_query_batch_size=4,
        per_device_train_batch_size=4, score_args=score_args,
        target_data_partitions=[0],
    )
    scores_dir = analyzer.scores_output_dir("s")
    part_path = pairwise_scores_save_path(scores_dir, (0, 0))
    assert part_path.exists()
    assert not pairwise_scores_save_path(scores_dir).exists()

    # Plant a sentinel: if the rerun recomputed partition 0 the sentinel
    # would be overwritten with real scores.
    planted = {k: np.full_like(v, 123.0) for k, v in load_file(part_path).items()}
    save_file(planted, part_path)

    # Job 2: full run resumes — partition 0 loaded, partition 1 computed.
    analyzer.compute_pairwise_scores(
        "s", "f", queries, data, per_device_query_batch_size=4,
        per_device_train_batch_size=4, score_args=score_args,
    )
    final = analyzer.load_pairwise_scores("s")[ALL_MODULE_NAME]
    assert final.shape == (4, 12)
    np.testing.assert_array_equal(final[:, :6], 123.0)
    assert not np.allclose(final[:, 6:], 123.0)


def test_new_argument_fields_do_not_invalidate_old_artifacts(tmp_path):
    """Artifact dirs written before a field existed stay resumable: the
    argument-conflict check compares on the key intersection."""
    import json

    from kronfluence_tpu import Analyzer

    model, params, task = make_mlp()
    data = make_regression_data(8)
    factor_args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    analyzer = Analyzer("argcompat", model, task, params=params, output_dir=str(tmp_path))
    analyzer.fit_all_factors("f", data, per_device_batch_size=4, factor_args=factor_args)

    args_path = analyzer.factors_output_dir("f") / "factor_arguments.json"
    saved = json.loads(args_path.read_text())
    removed = saved.pop("eigendecomposition_solver")  # simulate an old version's file
    args_path.write_text(json.dumps(saved))

    # Rerun: must skip cleanly (no conflict error from the missing field)...
    analyzer.fit_all_factors("f", data, per_device_batch_size=4, factor_args=factor_args)
    # ...but a genuine mismatch on a shared field must still raise. Remove an
    # artifact so the stage is incomplete (a complete stage skips before the
    # args check, mirroring the reference's skip-if-exists ordering).
    (analyzer.factors_output_dir("f") / "activation_covariance.safetensors").unlink()
    changed = FactorArguments(strategy="diagonal", **FP64_FACTOR)
    with pytest.raises(ValueError, match="differ"):
        analyzer.fit_covariance_matrices(
            "f", data, per_device_batch_size=4, factor_args=changed
        )
    assert removed == "auto"


def test_device_resident_dataset_matches_host():
    """A device-resident column store (pre-uploaded data) yields batches
    sliced on device and identical factors to the host-numpy path."""
    model, params, task = make_mlp()
    host_data = make_regression_data(10)
    dev_data = jax.device_put(host_data)
    assert all(hasattr(v, "devices") for v in dev_data.values())
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    base = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(host_data, 4), args
    )
    dev = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(dev_data, 4), args
    )
    for factor_name in base:
        for mod in base[factor_name]:
            np.testing.assert_allclose(
                np.asarray(base[factor_name][mod]), np.asarray(dev[factor_name][mod]),
                rtol=1e-12, atol=1e-14,
            )
    # Subset indices (non-contiguous) also work on the device path.
    idx = np.asarray([1, 3, 4, 7, 8])
    sub_host = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(host_data, 3, indices=idx), args
    )
    sub_dev = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(dev_data, 3, indices=idx), args
    )
    name = sorted(sub_host[ACTIVATION_COVARIANCE_MATRIX_NAME])[0]
    np.testing.assert_allclose(
        np.asarray(sub_host[ACTIVATION_COVARIANCE_MATRIX_NAME][name]),
        np.asarray(sub_dev[ACTIVATION_COVARIANCE_MATRIX_NAME][name]),
        rtol=1e-12, atol=1e-14,
    )


def test_missing_factors_raise_clear_error():
    """Cleared/incomplete factor dicts fail preparation with a clear message,
    not a KeyError mid-run (warm-cache + factors.clear() footgun)."""
    from kronfluence_tpu.arguments import ScoreArguments
    from kronfluence_tpu.score.common import prepare_precondition_states
    from kronfluence_tpu.utils.exceptions import FactorsNotFoundError

    with pytest.raises(FactorsNotFoundError, match="required by the 'ekfac' strategy"):
        prepare_precondition_states({}, "ekfac", ScoreArguments(), ["layer0"])


def test_value_cache_eviction_and_clear():
    """cached_value keeps one entry per exclusive_group and clear_value_cache
    releases everything (HBM-bounding behavior for precondition states)."""
    from kronfluence_tpu.utils.jit_cache import cached_value, clear_value_cache

    class M:
        pass

    m = M()
    a1, a2 = object(), object()
    v1 = cached_value(m, ("k", 1), a1, lambda: "one", exclusive_group="g")
    assert cached_value(m, ("k", 1), a1, lambda: "MISS", exclusive_group="g") == "one"
    v2 = cached_value(m, ("k", 2), a2, lambda: "two", exclusive_group="g")
    assert v1 == "one" and v2 == "two"
    assert list(m._value_cache) == [("k", 2)]  # old group entry evicted
    # New anchor under the same key replaces (no double-pinning).
    assert cached_value(m, ("k", 2), object(), lambda: "three", exclusive_group="g") == "three"
    assert len(m._value_cache) == 1
    clear_value_cache(m)
    assert not m._value_cache


def test_profiler_records_stage_subphases(tmp_path):
    """Stage drivers thread the profiler: the summary shows per-phase rows
    (reference: every stage body wrapped in profiler.profile, logger.py:57-154)
    and the total only sums top-level regions despite nesting."""
    from kronfluence_tpu.analyzer import Analyzer
    from kronfluence_tpu.arguments import ScoreArguments
    from kronfluence_tpu.utils.logger import get_time

    model, params, task = make_mlp()
    analyzer = Analyzer(
        "prof", model, task, params=params, output_dir=str(tmp_path),
        disable_tqdm=True, profile=True,
    )
    data = make_regression_data(12)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    analyzer.fit_all_factors("f", data, per_device_batch_size=6, factor_args=args)
    analyzer.compute_pairwise_scores(
        "s", "f", make_regression_data(4, seed=1), data,
        per_device_query_batch_size=2, per_device_train_batch_size=6,
        score_args=ScoreArguments(
            score_dtype="float64", per_sample_gradient_dtype="float64",
            precondition_dtype="float64",
        ),
    )
    summary = analyzer.profiler.summary()
    for row in (
        "Covariance: batch loop",
        "Lambda: batch loop",
        "Pairwise: query gradients",
        "Pairwise: train pass",
        "Fit Covariance",
    ):
        assert row in summary, f"missing profiler row: {row}\n{summary}"
    totals = analyzer.profiler._totals
    depths = analyzer.profiler._depths
    top = sum(t for k, t in totals.items() if depths[k] == 0)
    assert sum(totals.values()) > top > 0  # nesting exists, total excludes it
    # Cross-process MAX-synced clock is monotonic and usable single-process.
    t0 = get_time()
    t1 = get_time()
    assert t1 >= t0


def test_fit_all_factors_overlap_handoff_matches_staged(tmp_path):
    """fit_all_factors hands the eigendecomposition to the Lambda stage in
    memory and writes its artifacts on a background thread; the resulting
    on-disk factors must be identical to staged per-stage calls (and present —
    the async save must be joined before fit_all_factors returns)."""
    from kronfluence_tpu import Analyzer

    model, params, task = make_mlp()
    data = make_regression_data(12)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)

    analyzer = Analyzer("overlap_test", model, task, params=params, output_dir=str(tmp_path))
    analyzer.fit_all_factors("combined", data, per_device_batch_size=4, factor_args=args)
    # Staged path: each stage separately, disk round-trip between them.
    analyzer.fit_covariance_matrices("staged", data, per_device_batch_size=4, factor_args=args)
    analyzer.perform_eigendecomposition("staged", factor_args=args)
    analyzer.fit_lambda_matrices("staged", data, per_device_batch_size=4, factor_args=args)

    eig_a = analyzer.load_eigendecomposition("combined")
    eig_b = analyzer.load_eigendecomposition("staged")
    for factor_name in eig_b:
        assert set(eig_a[factor_name]) == set(eig_b[factor_name])
        for mod in eig_b[factor_name]:
            np.testing.assert_array_equal(eig_a[factor_name][mod], eig_b[factor_name][mod])
    lam_a = analyzer.load_lambda_matrices("combined")
    lam_b = analyzer.load_lambda_matrices("staged")
    for factor_name in lam_b:
        for mod in lam_b[factor_name]:
            np.testing.assert_array_equal(lam_a[factor_name][mod], lam_b[factor_name][mod])


def test_wait_for_async_saves_reraises(tmp_path, monkeypatch):
    """A failed background artifact write must surface, not vanish — a
    silently missing eigendecomposition file breaks skip-if-exists resume."""
    from kronfluence_tpu import Analyzer
    from kronfluence_tpu.factor import io as factor_io

    model, params, task = make_mlp()
    data = make_regression_data(8)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    analyzer = Analyzer("asyncfail_test", model, task, params=params, output_dir=str(tmp_path))
    analyzer.fit_covariance_matrices("f", data, per_device_batch_size=4, factor_args=args)

    def boom(*a, **k):
        raise OSError("disk full (injected)")

    monkeypatch.setattr(factor_io, "save_eigendecomposition", boom)
    analyzer.perform_eigendecomposition("f", factor_args=args, async_save=True)
    with pytest.raises(OSError, match="disk full"):
        analyzer.wait_for_async_saves()
    assert analyzer._pending_saves == []


def test_load_factor_and_score_args_roundtrip(tmp_path):
    """Reference-named accessors (reference computer.py:336,365): persisted
    arguments load back as dataclasses; None before anything is saved."""
    from kronfluence_tpu import Analyzer, ScoreArguments

    model, params, task = make_mlp()
    analyzer = Analyzer("args_rt", model, task, params=params, output_dir=str(tmp_path))
    assert analyzer.load_factor_args("nope") is None
    assert analyzer.load_score_args("nope") is None

    data = make_regression_data(8)
    fa = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    analyzer.fit_all_factors("f", data, per_device_batch_size=4, factor_args=fa)
    loaded = analyzer.load_factor_args("f")
    assert loaded is not None and loaded.strategy == "ekfac"
    assert loaded.use_empirical_fisher

    sa = ScoreArguments(query_gradient_accumulation_steps=2, score_dtype="float64",
                        per_sample_gradient_dtype="float64", precondition_dtype="float64")
    analyzer.compute_pairwise_scores("s", "f", data, data, per_device_query_batch_size=4,
                                     per_device_train_batch_size=4, score_args=sa)
    sloaded = analyzer.load_score_args("s")
    assert sloaded is not None
    assert sloaded.query_gradient_accumulation_steps == 2
    assert sloaded.score_dtype == "float64"
