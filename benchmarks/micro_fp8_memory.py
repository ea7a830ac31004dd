"""XLA memory_analysis of the pairwise train superstep: dense vs fp8 blocks.

The fp8 full bench OOMs where the equal-HBM-by-arithmetic bf16 run is green,
and the tunneled backend returns no memory_stats, so this probe asks the
compiler directly: it lowers the EXACT train superstep the driver builds
(scanned_map_superstep over _make_train_apply) with abstract inputs for each
(storage, block size) config and prints the compiled executable's
argument/output/temp sizes. temp_size is the scheduler's true transient
working set — the number the analytic model's dequantize term approximates.

No chip time is used (lower + compile only), so it can run while the TPU is
busy. Compiles are minutes each on the remote server and persist in the
cache.

Usage: python benchmarks/micro_fp8_memory.py [config ...]
  config = dtype:queries, e.g. bfloat16:40 float8_e4m3fn:72
  default: bfloat16:40 float8_e4m3fn:40 float8_e4m3fn:56 float8_e4m3fn:72
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kronfluence_tpu.utils.platform import enable_persistent_cache

enable_persistent_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.ops.quantize import QuantizedGradient
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.score.pairwise import _make_train_apply
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.common.factor_arguments import (
    smart_low_precision_factor_arguments,
)
from kronfluence_tpu.utils.common.score_arguments import (
    smart_low_precision_score_arguments,
)
from kronfluence_tpu.utils.scan_loop import SCAN_CHUNK, scanned_map_superstep


def log(msg):
    print(msg, file=sys.stderr, flush=True)


CONFIGS = []
for arg in sys.argv[1:]:
    dt, q = arg.split(":")
    CONFIGS.append((dt, int(q)))
if not CONFIGS:
    CONFIGS = [
        ("bfloat16", 40),
        ("float8_e4m3fn", 40),
        ("float8_e4m3fn", 56),
        ("float8_e4m3fn", 72),
    ]

SEQ = 512
QUERY_BATCH = 8
TRAIN_BATCH = 16
N_PAD = 4672  # 4656 padded to the batch multiple

config = TransformerConfig(
    vocab_size=50257, max_seq_len=SEQ, num_layers=12, num_heads=12,
    d_model=768, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
module = TransformerLM(config)


class BenchTask(Task):
    def compute_train_loss(self, batch, model, sample=False, rng=None):
        logits = model(batch["input_ids"], batch["attention_mask"])[:, :-1]
        mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
        labels = batch["input_ids"][:, 1:]
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels)
        return jnp.sum(losses * mask)

    def compute_measurement(self, batch, model):
        return self.compute_train_loss(batch, model)

    def get_influence_tracked_modules(self):
        names = []
        for i in range(config.num_layers):
            names += [f"h_{i}/attn/c_attn", f"h_{i}/attn/c_proj",
                      f"h_{i}/mlp/c_fc", f"h_{i}/mlp/c_proj"]
        return names

    def get_attention_mask(self, batch):
        return batch["attention_mask"]


task = BenchTask()
model = prepare_model(module, task)
params_shapes = jax.eval_shape(
    lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, SEQ), jnp.int32))[
        "params"
    ]
)

# (o, i) per tracked module: Dense bias column appends +1 to the input dim.
MODULE_DIMS = {}
for i in range(config.num_layers):
    MODULE_DIMS[f"h_{i}/attn/c_attn"] = (3 * config.d_model, config.d_model + 1)
    MODULE_DIMS[f"h_{i}/attn/c_proj"] = (config.d_model, config.d_model + 1)
    MODULE_DIMS[f"h_{i}/mlp/c_fc"] = (4 * config.d_model, config.d_model + 1)
    MODULE_DIMS[f"h_{i}/mlp/c_proj"] = (config.d_model, 4 * config.d_model + 1)

factor_args = smart_low_precision_factor_arguments(strategy="ekfac")
columns = {
    "input_ids": jax.ShapeDtypeStruct((N_PAD, SEQ), jnp.int32),
    "attention_mask": jax.ShapeDtypeStruct((N_PAD, SEQ), jnp.int32),
}
starts = jax.ShapeDtypeStruct((SCAN_CHUNK,), jnp.int32)
nvalids = jax.ShapeDtypeStruct((SCAN_CHUNK,), jnp.int32)

for storage, queries in CONFIGS:
    score_args = smart_low_precision_score_arguments()
    acc = queries // QUERY_BATCH
    score_args.query_gradient_accumulation_steps = acc
    if storage != "bfloat16":
        score_args.query_gradient_storage_dtype = storage
        block = {
            name: [
                QuantizedGradient(
                    jax.ShapeDtypeStruct((QUERY_BATCH, o, i), jnp.dtype(storage)),
                    jax.ShapeDtypeStruct((QUERY_BATCH, 1, 1), jnp.float32),
                )
                for _ in range(acc)
            ]
            for name, (o, i) in MODULE_DIMS.items()
        }
    else:
        block = {
            name: [
                jax.ShapeDtypeStruct((QUERY_BATCH, o, i), jnp.bfloat16)
                for _ in range(acc)
            ]
            for name, (o, i) in MODULE_DIMS.items()
        }

    apply = _make_train_apply(
        model, task, list(model.tracked_names), score_args, per_module=False
    )
    superstep = scanned_map_superstep(
        lambda batch, valid, p, qb: apply(p, batch, valid, qb), TRAIN_BATCH
    )
    t0 = time.time()
    lowered = superstep.lower(columns, starts, nvalids, params_shapes, block)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024**3
    log(
        f"{storage}:{queries} -> args {ma.argument_size_in_bytes / gib:.2f} GiB, "
        f"out {ma.output_size_in_bytes / gib:.3f} GiB, "
        f"TEMP {ma.temp_size_in_bytes / gib:.2f} GiB, "
        f"total {(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes) / gib:.2f} GiB "
        f"(compile {time.time() - t0:.0f}s)"
    )
