import sys, time
sys.path.insert(0, "/root/repo")
from kronfluence_tpu.utils.platform import enable_persistent_cache
enable_persistent_cache("/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np, optax
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task
from kronfluence_tpu.factor.covariance import discover_stage_specs
from kronfluence_tpu.score.pairwise import _build_train_step
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
r = np.random.default_rng(0)
TB = 16
batch = {"input_ids": jnp.asarray(r.integers(1, config.vocab_size, size=(TB, SEQ)).astype(np.int32)),
         "attention_mask": jnp.ones((TB, SEQ), jnp.int32)}
valid = jnp.ones((TB,), jnp.float32)
specs = discover_stage_specs(model, task, params, batch, model.tracked_names)
sa = smart_low_precision_score_arguments()
key = jax.random.PRNGKey(1)

def make_block(total_q, n_chunks):
    per = total_q // n_chunks
    block = {}
    for name, spec in specs.items():
        o, i = spec.gradient_dim, spec.activation_dim
        block[name] = [jax.random.normal(jax.random.fold_in(key, hash(name+str(c)) % 2**30),
                                         (per, o, i), jnp.bfloat16) * 0.01
                       for c in range(n_chunks)]
    return block

ts = _build_train_step(model, task, list(model.tracked_names), sa, per_module=False, mesh=None)

def timeit(block, label, reps=10):
    out = ts(params, batch, valid, block)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    t0 = time.time()
    for _ in range(reps):
        out = ts(params, batch, valid, block)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    dt = (time.time() - t0) / reps
    q = sum(c.shape[0] for c in next(iter(block.values())))
    print(f"{label}: {dt*1000:.1f} ms/step -> {q*TB/dt:.0f} pairs/s", flush=True)

timeit(make_block(40, 1), "block40 x1chunk")
timeit(make_block(40, 4), "block40 x4chunks")
timeit(make_block(40, 2), "block40 x2chunks")
timeit(make_block(48, 6), "block48 x6chunks")
