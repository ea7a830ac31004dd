"""LDS evaluation harness (reference: examples/glue/evaluate_lds.py).

CI-sized counterfactual check: on a small regression problem with exact
subset retraining (ridge solve), EKFAC influence scores must predict
retraining outcomes better than identity (gradient-dot-product) scores —
mirroring the ordering the reference publishes (e.g. wikitext LDS 0.44 ekfac
vs 0.12 identity)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, Task, prepare_model
from kronfluence_tpu.evaluate import (
    evaluate_lds,
    linear_datamodeling_score,
    sample_subset_masks,
    spearman_correlation,
)

D = 6
N_TRAIN = 64
N_QUERY = 8


class LinearModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, use_bias=False, param_dtype=jnp.float64, name="fc")(x)


class RegressionTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        preds = model(batch["x"])
        return 0.5 * jnp.sum((preds - batch["y"]) ** 2)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)


def _make_problem(seed=0):
    rng = np.random.default_rng(seed)
    w_true = rng.standard_normal((D, 1))
    x_train = rng.standard_normal((N_TRAIN, D))
    y_train = x_train @ w_true + 0.3 * rng.standard_normal((N_TRAIN, 1))
    x_query = rng.standard_normal((N_QUERY, D))
    y_query = x_query @ w_true + 0.3 * rng.standard_normal((N_QUERY, 1))
    return x_train, y_train, x_query, y_query


def _scores(strategy, train, query, tmp_path):
    module = LinearModel()
    task = RegressionTask()
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(train["x"][:1]))["params"]
    # Analyze at the full-data ridge solution (influence assumes optimum).
    x, y = train["x"], train["y"]
    ridge = 1e-3
    w_star = np.linalg.solve(x.T @ x + ridge * np.eye(D), x.T @ y)
    params = {"fc": {"kernel": jnp.asarray(w_star)}}
    analyzer = Analyzer(
        f"lds_{strategy}", prepare_model(module, task), task, params=params,
        output_dir=str(tmp_path),
    )
    fa = FactorArguments(
        strategy=strategy, use_empirical_fisher=True,
        activation_covariance_dtype="float64", gradient_covariance_dtype="float64",
        eigendecomposition_dtype="float64", per_sample_gradient_dtype="float64",
        lambda_dtype="float64",
    )
    sa = ScoreArguments(
        damping_factor=1e-3,
        per_sample_gradient_dtype="float64", precondition_dtype="float64",
        score_dtype="float64", query_gradient_svd_dtype="float64",
    )
    analyzer.fit_all_factors("f", train, per_device_batch_size=16, factor_args=fa)
    analyzer.compute_pairwise_scores(
        "s", "f", query, train, per_device_query_batch_size=8,
        per_device_train_batch_size=16, score_args=sa,
    )
    return analyzer.load_pairwise_scores("s")["all_modules"]


def test_spearman_basics():
    a = np.array([[1.0, 2.0, 3.0, 4.0]])
    assert spearman_correlation(a, a)[0] == 1.0
    assert spearman_correlation(a, -a)[0] == -1.0


def test_lds_orders_strategies(tmp_path):
    x_train, y_train, x_query, y_query = _make_problem()
    train = {"x": x_train, "y": y_train}
    query = {"x": x_query, "y": y_query}

    ekfac = _scores("ekfac", train, query, tmp_path)
    identity = _scores("identity", train, query, tmp_path)

    ridge = 1e-3

    def train_fn(idx, seed):
        xs, ys = x_train[idx], y_train[idx]
        return np.linalg.solve(xs.T @ xs + ridge * np.eye(D), xs.T @ ys)

    def measure_fn(w):
        # Negative query loss ("the margin"): including helpful examples
        # should raise it, matching the positive-correlation convention.
        preds = x_query @ w
        return -0.5 * np.sum((preds - y_query) ** 2, axis=1)

    masks = sample_subset_masks(N_TRAIN, num_subsets=48, subset_fraction=0.5, seed=3)
    lds_ekfac, _ = evaluate_lds(
        ekfac, train_fn, measure_fn, N_TRAIN, masks=masks
    )
    lds_identity, _ = evaluate_lds(
        identity, train_fn, measure_fn, N_TRAIN, masks=masks
    )
    # Scores estimate the effect of REMOVING an example; the measured margin
    # moves with inclusion, so good scores correlate positively here after
    # the sign convention above.
    assert lds_ekfac > 0.35, (lds_ekfac, lds_identity)
    assert lds_ekfac > lds_identity - 1e-6, (lds_ekfac, lds_identity)


def test_linear_datamodeling_score_shape():
    scores = np.random.default_rng(0).standard_normal((3, 10))
    masks = sample_subset_masks(10, 5, 0.5, 1)
    meas = np.random.default_rng(1).standard_normal((5, 3))
    mean, per_query = linear_datamodeling_score(scores, meas, masks)
    assert per_query.shape == (3,)
    assert -1.0 <= mean <= 1.0
