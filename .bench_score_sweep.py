"""Score-stage batch-size sweep (throwaway experiment)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from kronfluence_tpu.utils.platform import enable_persistent_cache
enable_persistent_cache("/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np, optax

from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
from kronfluence_tpu.factor.eigen import fit_lambda_matrices_with_loader, perform_eigendecomposition
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.common.factor_arguments import smart_low_precision_factor_arguments
from kronfluence_tpu.utils.common.score_arguments import smart_low_precision_score_arguments
from kronfluence_tpu.utils.dataset import BatchLoader

SEQ = 512
config = TransformerConfig(vocab_size=50257, max_seq_len=SEQ, num_layers=12,
                           num_heads=12, d_model=768, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
module = TransformerLM(config)

class T(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["input_ids"], batch["attention_mask"])[:, :-1]
        mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
        labels = batch["input_ids"][:, 1:]
        losses = optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), labels)
        return jnp.sum(losses * mask)
    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)
    def get_influence_tracked_modules(self):
        return [f"h_{i}/{m}" for i in range(config.num_layers)
                for m in ("attn/c_attn", "attn/c_proj", "mlp/c_fc", "mlp/c_proj")]
    def get_attention_mask(self, batch):
        return batch["attention_mask"]

task = T()
model = prepare_model(module, task)
params = jax.jit(lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, SEQ), jnp.int32))["params"])()

def make_data(n, seed):
    r = np.random.default_rng(seed)
    return {"input_ids": r.integers(1, config.vocab_size, size=(n, SEQ)).astype(np.int32),
            "attention_mask": np.ones((n, SEQ), dtype=np.int32)}

fa = smart_low_precision_factor_arguments(strategy="ekfac")
fa.use_empirical_fisher = True
fa.eigendecomposition_dtype = "float32"

t0 = time.time()
cov = fit_covariance_matrices_with_loader(model, params, task, BatchLoader(make_data(32, 1), 16), fa)
eigen = perform_eigendecomposition(cov, fa)
lam = fit_lambda_matrices_with_loader(model, params, task, BatchLoader(make_data(32, 2), 16), fa, eigen_factors=eigen)
del cov
factors = {**eigen, **lam}
jax.tree_util.tree_map(lambda x: None, factors)
print(f"factor prep: {time.time()-t0:.0f}s", flush=True)

sa = smart_low_precision_score_arguments()
N_TRAIN = 2048
for QB, TB in [(40, 16), (40, 32), (64, 16), (64, 32), (80, 32)]:
    try:
        qd = make_data(QB, 5)
        warm = compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(qd, QB), BatchLoader(make_data(2*TB, 6), TB),
            factors, fa, sa)
        t0 = time.time()
        res = compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(qd, QB), BatchLoader(make_data(N_TRAIN, 7), TB),
            factors, fa, sa)
        dt = time.time() - t0
        print(f"QB={QB} TB={TB}: {QB*N_TRAIN/dt:.0f} pairs/s  ({dt:.1f}s)", flush=True)
    except Exception as e:
        print(f"QB={QB} TB={TB}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
