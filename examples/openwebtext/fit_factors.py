"""OpenWebText/Llama-style large-LM factor fitting (reference:
examples/openwebtext/fit_factors.py).

The reference's biggest workload: MLP-only tracked modules, bf16,
extreme-reduce-memory arguments with (module x data) partitions on 4 GPUs.
Here the same recipe runs on a TPU mesh: batch sharded over the data axis,
parameters sharded over the model axis (FSDP analogue), partitioned artifacts
on disk for preemption-safe resume.

    python examples/openwebtext/fit_factors.py --num_layers 4 --d_model 512
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu import Analyzer, prepare_model
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.parallel.mesh import make_mesh
from kronfluence_tpu.utils.common.factor_arguments import (
    extreme_reduce_memory_factor_arguments,
)


from examples.openwebtext.task import MLPOnlyLMTask


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", choices=("gpt2", "llama"), default="gpt2",
                        help="llama = RMSNorm/RoPE/GQA/SwiGLU, no-bias Dense "
                             "(the reference's actual 8B architecture)")
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--d_model", type=int, default=512)
    parser.add_argument("--d_mlp", type=int, default=None,
                        help="llama MLP width (real 8B: 14336)")
    parser.add_argument("--num_heads", type=int, default=8)
    parser.add_argument("--num_kv_heads", type=int, default=None)
    parser.add_argument("--seq_len", type=int, default=256)
    parser.add_argument("--vocab", type=int, default=8192)
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--per_device_batch_size", type=int, default=4)
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--module_partitions", type=int, default=2)
    parser.add_argument("--data_partitions", type=int, default=2)
    parser.add_argument("--output_dir", default="./influence_results/openwebtext")
    args = parser.parse_args()

    mesh = make_mesh(model=args.model_parallel)
    print(f"mesh: {dict(mesh.shape)}")

    if args.arch == "llama":
        from kronfluence_tpu.models.llama import LlamaConfig, LlamaLM

        from examples.openwebtext.task import LlamaMLPOnlyTask

        config = LlamaConfig(
            vocab_size=args.vocab, max_seq_len=args.seq_len,
            num_layers=args.num_layers, num_heads=args.num_heads,
            num_kv_heads=args.num_kv_heads or max(1, args.num_heads // 4),
            d_model=args.d_model, d_mlp=args.d_mlp or (args.d_model * 7 // 2),
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        module = LlamaLM(config)
        task = LlamaMLPOnlyTask(args.num_layers)
    else:
        config = TransformerConfig(
            vocab_size=args.vocab, max_seq_len=args.seq_len,
            num_layers=args.num_layers, num_heads=args.num_heads, d_model=args.d_model,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        module = TransformerLM(config)
        task = MLPOnlyLMTask(args.num_layers)
    model = prepare_model(module, task)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.seq_len), jnp.int32)
    )["params"]

    # FSDP-style: shard every matrix's last dim over the model axis.
    from kronfluence_tpu.parallel.mesh import shard_params_fsdp

    params = shard_params_fsdp(params, mesh)

    rng = np.random.default_rng(0)
    train_data = {
        "input_ids": rng.integers(1, args.vocab, size=(args.num_train, args.seq_len)).astype(np.int32),
        "attention_mask": np.ones((args.num_train, args.seq_len), dtype=np.int32),
    }

    factor_args = extreme_reduce_memory_factor_arguments(
        strategy="ekfac", module_partitions=args.module_partitions
    )
    factor_args.covariance_data_partitions = args.data_partitions
    factor_args.lambda_data_partitions = args.data_partitions
    factor_args.eigendecomposition_dtype = "float32"  # on-device batched eigh
    # One-off shapes: the blocked-Jacobi solver compiles in seconds. QDWH's
    # minutes-long per-shape remote compile (never amortized for a single
    # run) stalled the 2026-08-20 8B-shape attempts before the first solve.
    # The >= LARGE_EIGH_DIM (14336) factors route through per-matrix
    # eigh_large regardless of this knob.
    factor_args.eigendecomposition_solver = "jacobi"

    analyzer = Analyzer("openwebtext", model, task, params=params, mesh=mesh,
                        output_dir=args.output_dir, profile=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.per_device_batch_size,
        factor_args=factor_args,
    )
    print("factor fitting complete; artifacts (partitioned + aggregated):")
    for f in sorted(Path(analyzer.factors_output_dir("ekfac")).glob("*.safetensors")):
        print(" ", f.name)
    print(analyzer.profiler.summary())
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)() or {}
    if stats:
        print(
            f"peak HBM: {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB "
            f"of {stats.get('bytes_limit', 0) / 2**30:.2f} GiB"
        )


if __name__ == "__main__":
    main()
