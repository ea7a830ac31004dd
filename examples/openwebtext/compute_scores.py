"""Pairwise scoring for the large-LM recipe: low-rank query batching.

Reference analogue: /root/reference/examples/openwebtext/compute_scores.py —
loads the factors fitted by fit_factors.py and computes pairwise scores for a
set of query prompts with rank-64 query-gradient batching, bf16, and
aggregated per-query saving. Runs on the same mesh/partition setup as the fit.

    python examples/openwebtext/compute_scores.py --num_layers 4 --d_model 512
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax.numpy as jnp
import numpy as np

from examples.openwebtext.task import MLPOnlyLMTask
from kronfluence_tpu import Analyzer, ScoreArguments, prepare_model
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM
from kronfluence_tpu.parallel.mesh import make_mesh
from kronfluence_tpu.utils.common.score_arguments import (
    extreme_reduce_memory_score_arguments,
)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", choices=("gpt2", "llama"), default="gpt2",
                        help="must match the fit_factors.py run that saved "
                             "the factors (llama = RMSNorm/RoPE/GQA/SwiGLU)")
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--d_model", type=int, default=512)
    parser.add_argument("--d_mlp", type=int, default=None,
                        help="llama MLP width (real 8B: 14336)")
    parser.add_argument("--num_heads", type=int, default=8)
    parser.add_argument("--num_kv_heads", type=int, default=None)
    parser.add_argument("--seq_len", type=int, default=256)
    parser.add_argument("--vocab", type=int, default=8192)
    parser.add_argument("--num_train", type=int, default=256)
    parser.add_argument("--num_query", type=int, default=8)
    parser.add_argument("--per_device_batch_size", type=int, default=4)
    parser.add_argument("--per_device_query_batch_size", type=int, default=4)
    parser.add_argument("--query_gradient_low_rank", type=int, default=64)
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--output_dir", default="./influence_results/openwebtext")
    return parser.parse_args()


def main():
    args = parse_args()
    mesh = make_mesh(model=args.model_parallel)

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
    import jax

    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.seq_len), jnp.int32)
    )["params"]

    rng = np.random.default_rng(0)
    train_data = {
        "input_ids": rng.integers(1, args.vocab, size=(args.num_train, args.seq_len)).astype(np.int32),
        "attention_mask": np.ones((args.num_train, args.seq_len), dtype=np.int32),
    }
    query_rng = np.random.default_rng(1)
    query_data = {
        "input_ids": query_rng.integers(1, args.vocab, size=(args.num_query, args.seq_len)).astype(np.int32),
        "attention_mask": np.ones((args.num_query, args.seq_len), dtype=np.int32),
    }

    # Reference recipe: rank-64 query batching + bf16 + accumulation
    # (compute_scores.py:49-59 builds extreme_reduce_memory_score_arguments
    # with query_gradient_low_rank=64).
    score_args = extreme_reduce_memory_score_arguments(
        query_gradient_low_rank=args.query_gradient_low_rank
    )

    analyzer = Analyzer("openwebtext", model, task, params=params, mesh=mesh,
                        output_dir=args.output_dir, profile=True)
    if not Path(analyzer.factors_output_dir("ekfac")).exists():
        raise SystemExit(
            "Factors not found — run examples/openwebtext/fit_factors.py first "
            "with the same --output_dir."
        )
    analyzer.compute_pairwise_scores(
        "prompt_scores", "ekfac", query_data, train_data,
        per_device_query_batch_size=min(
            args.num_query, args.per_device_query_batch_size
        ),
        per_device_train_batch_size=args.per_device_batch_size,
        score_args=score_args,
    )
    scores = analyzer.load_pairwise_scores("prompt_scores")["all_modules"]
    print(f"pairwise scores: {scores.shape}")
    for q in range(min(3, scores.shape[0])):
        top = np.argsort(scores[q])[::-1][:5]
        print(f"  query {q}: top train sequences {list(top)}")
    print(analyzer.profiler.summary())


if __name__ == "__main__":
    main()
