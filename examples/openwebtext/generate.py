"""Greedy generation + influence attribution of the generated completion.

Reference analogue: /root/reference/examples/openwebtext/generate.py — sample
a completion from the model for a prompt, then (with compute_scores.py
machinery) attribute WHICH training sequences most influenced that completion.
Here: greedy decode with the TransformerLM, then pairwise scores whose
measurement is the completion log-likelihood given the prompt.

    python examples/openwebtext/generate.py --prompt_len 16 --gen_len 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from examples.openwebtext.task import MLPOnlyLMTask
from kronfluence_tpu import Analyzer, FactorArguments, ScoreArguments, prepare_model
from kronfluence_tpu.models.transformer import TransformerConfig, TransformerLM


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_layers", type=int, default=2)
    parser.add_argument("--d_model", type=int, default=128)
    parser.add_argument("--num_heads", type=int, default=2)
    parser.add_argument("--vocab", type=int, default=512)
    parser.add_argument("--prompt_len", type=int, default=16)
    parser.add_argument("--gen_len", type=int, default=16)
    parser.add_argument("--num_train", type=int, default=64)
    parser.add_argument("--per_device_batch_size", type=int, default=8)
    parser.add_argument("--output_dir", default="./influence_results/openwebtext_gen")
    return parser.parse_args()


class CompletionTask(MLPOnlyLMTask):
    """Measurement = negative log-likelihood of the COMPLETION tokens only
    (prompt positions masked out), matching the reference's prompt/completion
    split (openwebtext/task.py:74-100)."""

    def __init__(self, num_layers: int, prompt_len: int):
        super().__init__(num_layers)
        self.prompt_len = prompt_len

    def compute_measurement(self, batch, model):
        logits = model(batch["input_ids"], batch["attention_mask"])[:, :-1]
        logits = logits.astype(jnp.float32)
        labels = batch["input_ids"][:, 1:]
        mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
        position = jnp.arange(labels.shape[1])[None, :]
        completion_mask = (position >= self.prompt_len - 1).astype(jnp.float32)
        import optax

        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(losses * mask * completion_mask)


def greedy_generate(module, params, prompt, gen_len):
    """Static-shape greedy decode: re-run the full forward per step (fine at
    example scale; production decoding would use a lax.scan KV cache)."""
    tokens = prompt
    for _ in range(gen_len):
        pad_to = tokens.shape[1]
        logits = module.apply(
            {"params": params}, jnp.asarray(tokens),
            jnp.ones_like(jnp.asarray(tokens)),
        )
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))[:, None]
        tokens = np.concatenate([tokens, nxt.astype(tokens.dtype)], axis=1)
    return tokens


def main():
    args = parse_args()
    seq_len = args.prompt_len + args.gen_len
    config = TransformerConfig(
        vocab_size=args.vocab, max_seq_len=seq_len,
        num_layers=args.num_layers, num_heads=args.num_heads, d_model=args.d_model,
    )
    module = TransformerLM(config)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, seq_len), jnp.int32)
    )["params"]

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, args.vocab, size=(1, args.prompt_len)).astype(np.int32)
    completion = greedy_generate(module, params, prompt, args.gen_len)
    print(f"prompt tokens:     {prompt[0].tolist()}")
    print(f"generated tokens:  {completion[0, args.prompt_len:].tolist()}")

    task = CompletionTask(args.num_layers, args.prompt_len)
    model = prepare_model(module, task)
    train_data = {
        "input_ids": rng.integers(1, args.vocab, size=(args.num_train, seq_len)).astype(np.int32),
        "attention_mask": np.ones((args.num_train, seq_len), dtype=np.int32),
    }
    query_data = {
        "input_ids": completion,
        "attention_mask": np.ones_like(completion),
    }

    analyzer = Analyzer("openwebtext_gen", model, task, params=params,
                        output_dir=args.output_dir, disable_tqdm=True)
    analyzer.fit_all_factors(
        "ekfac", train_data, per_device_batch_size=args.per_device_batch_size,
        factor_args=FactorArguments(strategy="ekfac"), overwrite_output_dir=True,
    )
    analyzer.compute_pairwise_scores(
        "generation", "ekfac", query_data, train_data,
        per_device_query_batch_size=1,
        per_device_train_batch_size=args.per_device_batch_size,
        score_args=ScoreArguments(), overwrite_output_dir=True,
    )
    scores = analyzer.load_pairwise_scores("generation")["all_modules"][0]
    top = np.argsort(scores)[::-1][:8]
    print(f"training sequences most influential for this generation: {list(top)}")
    print(f"scores: {np.round(scores[top], 3)}")


if __name__ == "__main__":
    main()
