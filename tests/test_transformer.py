"""Transformer LM tests: capture through attention, masks, per-token scores,
tracked-module filtering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.utils.constants import (
    ALL_MODULE_NAME,
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
)
from kronfluence_tpu.utils.dataset import BatchLoader

from tests.testable_tasks.language_modeling import make_lm, make_lm_data

FP64_FACTOR = dict(
    use_empirical_fisher=True,
    activation_covariance_dtype="float64",
    gradient_covariance_dtype="float64",
    per_sample_gradient_dtype="float64",
    lambda_dtype="float64",
)
FP64_SCORE = dict(
    score_dtype="float64",
    per_sample_gradient_dtype="float64",
    precondition_dtype="float64",
)


def test_transformer_capture_matches_oracle():
    model, params, task, config = make_lm()
    data = make_lm_data(4, seq_len=config.max_seq_len, vocab=config.vocab_size)
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
    assert len(psg) == config.num_layers * 4 + 1  # qkv/proj/fc/proj per block + lm_head

    def single(params, ids, mask):
        one = {"input_ids": ids[None], "attention_mask": mask[None]}
        return task.compute_train_loss(one, model.bind(params))

    oracle = jax.vmap(jax.grad(single), in_axes=(None, 0, 0))(
        params, batch["input_ids"], batch["attention_mask"]
    )

    def lookup(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return node

    for name in ["h_0/attn/c_attn", "h_1/mlp/c_fc", "lm_head"]:
        node = lookup(oracle, name)
        expected = np.asarray(node["kernel"]).transpose(0, 2, 1)
        if "bias" in node:
            expected = np.concatenate(
                [expected, np.asarray(node["bias"])[:, :, None]], axis=-1
            )
        np.testing.assert_allclose(
            np.asarray(psg[name]), expected, rtol=1e-7, atol=1e-9, err_msg=name
        )


def test_attention_mask_token_counts():
    model, params, task, config = make_lm()
    data = make_lm_data(6, seq_len=config.max_seq_len, vocab=config.vocab_size)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    factors = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 3), args
    )
    total_tokens = int(data["attention_mask"].sum())
    count = int(
        factors[NUM_ACTIVATION_COVARIANCE_PROCESSED]["h_0/attn/c_attn"][0]
    )
    assert count == total_tokens


def test_mlp_only_tracked_modules():
    model, params, task, config = make_lm(mlp_only=True)
    data = make_lm_data(4, seq_len=config.max_seq_len, vocab=config.vocab_size)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    factors = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 2), args
    )
    names = set(factors[ACTIVATION_COVARIANCE_MATRIX_NAME])
    assert names == set(task.get_influence_tracked_modules())


@pytest.fixture(scope="module")
def lm_setup():
    model, params, task, config = make_lm(mlp_only=True)
    train = make_lm_data(8, seq_len=config.max_seq_len, vocab=config.vocab_size, seed=0)
    query = make_lm_data(3, seq_len=config.max_seq_len, vocab=config.vocab_size, seed=1)
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)
    cov = fit_covariance_matrices_with_loader(model, params, task, BatchLoader(train, 4), args)
    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(train, 4), args, eigen_factors=eigen
    )
    factors = {**cov, **eigen, **lam}
    return model, params, task, config, train, query, factors, args


def test_per_token_scores_sum_to_sequence_scores(lm_setup):
    model, params, task, config, train, query, factors, fargs = lm_setup
    seq = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(query, 3), BatchLoader(train, 4),
        factors, fargs, ScoreArguments(damping_factor=1e-8, **FP64_SCORE),
    )
    per_token = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(query, 3), BatchLoader(train, 4),
        factors, fargs,
        ScoreArguments(damping_factor=1e-8, compute_per_token_scores=True, **FP64_SCORE),
    )
    assert per_token[ALL_MODULE_NAME].ndim == 3
    np.testing.assert_allclose(
        per_token[ALL_MODULE_NAME].sum(axis=-1),
        seq[ALL_MODULE_NAME],
        rtol=1e-7,
        atol=1e-9,
    )


def test_sampled_fisher_runs(lm_setup):
    """True-Fisher (sampled labels) path is deterministic given the seed."""
    model, params, task, config, train, _, _, _ = lm_setup
    args = FactorArguments(strategy="ekfac", seed=7, use_empirical_fisher=False,
                           activation_covariance_dtype="float64",
                           gradient_covariance_dtype="float64")
    f1 = fit_covariance_matrices_with_loader(model, params, task, BatchLoader(train, 4), args)
    f2 = fit_covariance_matrices_with_loader(model, params, task, BatchLoader(train, 4), args)
    name = sorted(f1[ACTIVATION_COVARIANCE_MATRIX_NAME])[0]
    np.testing.assert_allclose(
        f1[ACTIVATION_COVARIANCE_MATRIX_NAME][name],
        f2[ACTIVATION_COVARIANCE_MATRIX_NAME][name],
    )


def test_scanned_flagship_matches_unrolled():
    """`scanned_lm_apply` (one block under scan_layers) must match the unrolled
    flax TransformerLM: logits, per-layer covariance AND lambda factors, under
    identical params. This is the bench's production path (VERDICT round-1 #2)."""
    from kronfluence_tpu.models.transformer import (
        TransformerConfig,
        TransformerLM,
        scanned_lm_apply,
        stack_layer_params,
    )
    from kronfluence_tpu.utils.constants import (
        GRADIENT_COVARIANCE_MATRIX_NAME,
        LAMBDA_MATRIX_NAME,
    )
    from tests.testable_tasks.language_modeling import LanguageModelingTask
    from kronfluence_tpu.prepare import prepare_model

    config = TransformerConfig(
        vocab_size=96, max_seq_len=12, num_layers=3, num_heads=2, d_model=16,
        dtype=jnp.float64, param_dtype=jnp.float64,
    )
    module = TransformerLM(config)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, config.max_seq_len), jnp.int32)
    )["params"]
    stacked = stack_layer_params(params, config.num_layers)
    apply_scanned = scanned_lm_apply(config)

    data = make_lm_data(10, seq_len=config.max_seq_len, vocab=config.vocab_size)
    ids = jnp.asarray(data["input_ids"])
    mask = jnp.asarray(data["attention_mask"])
    logits_u = module.apply({"params": params}, ids, mask)
    logits_s = apply_scanned(stacked, ids, mask)
    np.testing.assert_allclose(
        np.asarray(logits_s), np.asarray(logits_u), rtol=1e-12, atol=1e-12
    )

    task = LanguageModelingTask()
    args = FactorArguments(strategy="ekfac", **FP64_FACTOR)

    def fit(model, p):
        loader = BatchLoader(data, 5)
        cov = fit_covariance_matrices_with_loader(model, p, task, loader, args)
        eigen = perform_eigendecomposition(cov, args)
        lam = fit_lambda_matrices_with_loader(
            model, p, task, loader, args, eigen_factors=eigen
        )
        return cov, lam

    cov_u, lam_u = fit(prepare_model(module, task), params)
    cov_s, lam_s = fit(prepare_model(apply_scanned, task), stacked)

    block_names = sorted(
        n for n in cov_u[ACTIVATION_COVARIANCE_MATRIX_NAME] if n.startswith("h_")
    )
    assert block_names == sorted(
        n for n in cov_s[ACTIVATION_COVARIANCE_MATRIX_NAME] if n.startswith("h_")
    )
    assert len(block_names) == config.num_layers * 4
    for name in block_names:
        for factor in (ACTIVATION_COVARIANCE_MATRIX_NAME, GRADIENT_COVARIANCE_MATRIX_NAME):
            np.testing.assert_allclose(
                np.asarray(cov_s[factor][name]), np.asarray(cov_u[factor][name]),
                rtol=1e-9, atol=1e-12, err_msg=name,
            )
        np.testing.assert_allclose(
            np.asarray(lam_s[LAMBDA_MATRIX_NAME][name]),
            np.asarray(lam_u[LAMBDA_MATRIX_NAME][name]),
            rtol=1e-7, atol=1e-10, err_msg=name,
        )
