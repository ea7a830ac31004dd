"""HuggingFace Flax model support: GPT-2's FlaxConv1D captured natively.

The reference requires users to rewrite HF GPT-2's Conv1D modules into
nn.Linear before analysis (reference examples/wikitext/pipeline.py:14-20).
Here the capture interceptor recognizes `FlaxConv1D` directly — no model
surgery, checkpoints unchanged. Oracle: per-sample gradients captured through
a real FlaxGPT2LMHeadModel equal jax.vmap(jax.grad) on the same loss.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from kronfluence_tpu import FactorArguments, ScoreArguments, Task, prepare_model
from kronfluence_tpu.capture.engine import capture
from kronfluence_tpu.factor.covariance import (
    fit_covariance_matrices_with_loader,
    train_loss_forward,
)
from kronfluence_tpu.factor.eigen import (
    fit_lambda_matrices_with_loader,
    perform_eigendecomposition,
)
from kronfluence_tpu.score.common import module_per_sample_gradients
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.utils.constants import (
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    ALL_MODULE_NAME,
)
from kronfluence_tpu.utils.dataset import BatchLoader

B, SEQ, VOCAB = 6, 16, 128


class GPT2Task(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        import optax

        logits = model(batch["input_ids"], batch["attention_mask"],
                       jnp.cumsum(batch["attention_mask"], axis=1) - 1).logits[:, :-1]
        labels = batch["input_ids"][:, 1:]
        mask = batch["attention_mask"][:, 1:].astype(logits.dtype)
        if sample:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(losses * mask)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


@pytest.fixture(scope="module")
def gpt2_setup():
    config = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=SEQ, n_embd=16, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = transformers.FlaxGPT2LMHeadModel(config, seed=0, dtype=jnp.float64)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float64), hf.params)
    task = GPT2Task()
    model = prepare_model(hf.module, task)
    rng = np.random.default_rng(0)
    data = {
        "input_ids": rng.integers(1, VOCAB, size=(B, SEQ)).astype(np.int32),
        "attention_mask": (np.arange(SEQ)[None, :] < rng.integers(SEQ // 2, SEQ + 1, size=(B, 1))).astype(np.int32),
    }
    return model, params, task, data


def test_conv1d_modules_discovered(gpt2_setup):
    model, params, task, data = gpt2_setup
    batch = {k: jnp.asarray(v[:2]) for k, v in data.items()}
    specs = model.discover(
        params, batch["input_ids"], batch["attention_mask"],
        jnp.cumsum(batch["attention_mask"], axis=1) - 1,
    )
    names = set(specs)
    # 2 layers x (c_attn, c_proj, c_fc, mlp c_proj) = 8 FlaxConv1D modules.
    assert any("attn/c_attn" in n for n in names), names
    assert any("mlp/c_fc" in n for n in names), names
    assert len([n for n in names if "c_" in n]) == 8, names


def test_per_sample_gradients_match_autograd(gpt2_setup):
    model, params, task, data = gpt2_setup
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    valid = jnp.ones((B,), jnp.float64)

    forward = train_loss_forward(model, task, params, batch, sample=False,
                                 rng=jax.random.PRNGKey(0))
    _, captures = capture(forward, model.tracked_names)
    target = [n for n in captures if n.endswith("h/0/attn/c_attn")][0]
    psg = module_per_sample_gradients(captures[target], valid, jnp.float64)

    def one_loss(p, ids, mask):
        b = {"input_ids": ids[None], "attention_mask": mask[None]}
        return task.compute_train_loss(b, model.bind(p))

    grads = jax.vmap(
        lambda ids, mask: jax.grad(one_loss)(params, ids, mask)
    )(batch["input_ids"], batch["attention_mask"])
    # FlaxConv1D kernel is (out, in) == psg[..., :-1]; bias == psg[..., -1].
    kernel_key = grads["transformer"]["h"]["0"]["attn"]["c_attn"]["kernel"]
    bias_key = grads["transformer"]["h"]["0"]["attn"]["c_attn"]["bias"]
    np.testing.assert_allclose(np.asarray(psg[..., :-1]), np.asarray(kernel_key),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(psg[..., -1]), np.asarray(bias_key),
                               rtol=1e-9, atol=1e-11)


def test_end_to_end_pipeline_runs(gpt2_setup):
    model, params, task, data = gpt2_setup
    args = FactorArguments(
        strategy="ekfac", use_empirical_fisher=True,
        activation_covariance_dtype="float64", gradient_covariance_dtype="float64",
        per_sample_gradient_dtype="float64", lambda_dtype="float64",
    )
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 3), args
    )
    # 8 FlaxConv1D modules + the lm_head nn.Dense.
    assert len(cov[ACTIVATION_COVARIANCE_MATRIX_NAME]) == 9
    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, 3), args, eigen_factors=eigen
    )
    scores = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(data, 3), BatchLoader(data, 3),
        {**cov, **eigen, **lam}, args,
        ScoreArguments(score_dtype="float64", per_sample_gradient_dtype="float64",
                       precondition_dtype="float64"),
    )
    assert scores[ALL_MODULE_NAME].shape == (B, B)
    assert np.isfinite(scores[ALL_MODULE_NAME]).all()


class T5Task(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        import optax

        out = model(batch["input_ids"], batch["attention_mask"],
                    batch["decoder_input_ids"], batch["decoder_attention_mask"])
        logits = out.logits[:, :-1]
        labels = batch["decoder_input_ids"][:, 1:]
        mask = batch["decoder_attention_mask"][:, 1:].astype(logits.dtype)
        if sample:
            labels = jax.random.categorical(rng, jax.lax.stop_gradient(logits))
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(losses * mask)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)


def test_flax_t5_encoder_decoder_pipeline():
    """HF encoder-decoder (FlaxT5) works without surgery: 2 layers x
    (enc self-attn qkvo + ff wi/wo) + (dec self-attn + cross-attn + ff) +
    lm_head are all captured, and the factor pipeline runs."""
    config = transformers.T5Config(vocab_size=96, d_model=16, d_kv=8, d_ff=32,
                                   num_layers=2, num_heads=2, dropout_rate=0.0)
    hf = transformers.FlaxT5ForConditionalGeneration(config, seed=0, dtype=jnp.float64)
    task = T5Task()
    model = prepare_model(hf.module, task)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float64), hf.params)
    r = np.random.default_rng(0)
    data = {
        "input_ids": r.integers(1, 96, (4, 10)).astype(np.int32),
        "attention_mask": np.ones((4, 10), np.int32),
        "decoder_input_ids": r.integers(1, 96, (4, 8)).astype(np.int32),
        "decoder_attention_mask": np.ones((4, 8), np.int32),
    }
    args = FactorArguments(
        strategy="ekfac", use_empirical_fisher=True,
        activation_covariance_dtype="float64", gradient_covariance_dtype="float64",
        per_sample_gradient_dtype="float64", lambda_dtype="float64",
    )
    cov = fit_covariance_matrices_with_loader(
        model, params, task, BatchLoader(data, 2), args
    )
    # 2 enc layers x 6 + 2 dec layers x 10 + lm_head = 33 captured modules.
    assert len(cov[ACTIVATION_COVARIANCE_MATRIX_NAME]) == 33
    eigen = perform_eigendecomposition(cov, args)
    lam = fit_lambda_matrices_with_loader(
        model, params, task, BatchLoader(data, 2), args, eigen_factors=eigen
    )
    scores = compute_pairwise_scores_with_loaders(
        model, params, task, BatchLoader(data, 2), BatchLoader(data, 2),
        {**cov, **eigen, **lam}, args,
        ScoreArguments(score_dtype="float64", per_sample_gradient_dtype="float64",
                       precondition_dtype="float64"),
    )
    assert scores[ALL_MODULE_NAME].shape == (4, 4)
    assert np.isfinite(scores[ALL_MODULE_NAME]).all()
