"""Flagship decoder-only transformer LM (GPT-2 class), flax/TPU-native.

Plays the role of the reference's GPT-2/WikiText and Llama/OpenWebText
workloads (examples/wikitext, examples/openwebtext): every projection is an
`nn.Dense` (so the capture interceptor tracks it), attention is causal with
padding masks, and compute dtype is configurable (bf16 on TPU).

Tracked module names follow flax paths, e.g. `h_0/attn/c_attn`,
`h_0/mlp/c_fc` — the MLP-only filter used for Llama-style analyses
(reference examples/openwebtext/task.py:53-68) selects on these.
"""

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 50257
    max_seq_len: int = 1024
    num_layers: int = 12
    num_heads: int = 12
    d_model: int = 768
    d_mlp: Optional[int] = None  # defaults to 4*d_model
    dtype: Any = jnp.float32  # compute dtype (bf16 on TPU)
    param_dtype: Any = jnp.float32

    @property
    def mlp_dim(self) -> int:
        return self.d_mlp or 4 * self.d_model


def gpt2_small(**overrides) -> "TransformerConfig":
    return TransformerConfig(**overrides)


def tiny_config(**overrides) -> "TransformerConfig":
    base = dict(
        vocab_size=128, max_seq_len=32, num_layers=2, num_heads=2, d_model=32
    )
    base.update(overrides)
    return TransformerConfig(**base)


class Attention(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.config
        b, t, d = x.shape
        head_dim = d // cfg.num_heads
        qkv = nn.Dense(3 * d, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))
        mask = causal[None, None]
        if attention_mask is not None:
            mask = mask & (attention_mask[:, None, None, :] > 0)
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="c_proj")(out)


class MLPBlock(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="c_fc")(x)
        h = jax.nn.gelu(h)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="c_proj")(h)


class Block(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.config
        x = x + Attention(cfg, name="attn")(
            nn.LayerNorm(dtype=cfg.dtype, name="ln_1")(x), attention_mask
        )
        x = x + MLPBlock(cfg, name="mlp")(nn.LayerNorm(dtype=cfg.dtype, name="ln_2")(x))
        return x


class TransformerLM(nn.Module):
    """Decoder-only LM; returns logits (b, t, vocab)."""

    config: TransformerConfig

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="wte"
        )(input_ids)
        pos = nn.Embed(
            cfg.max_seq_len, cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="wpe"
        )(jnp.arange(t)[None])
        x = tok + pos
        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"h_{i}")(x, attention_mask)
        x = nn.LayerNorm(dtype=cfg.dtype, name="ln_f")(x)
        logits = nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="lm_head"
        )(x)
        return logits


def init_transformer(
    config: TransformerConfig, seed: int = 0, batch: int = 1
) -> Tuple[TransformerLM, Any]:
    module = TransformerLM(config)
    ids = jnp.zeros((batch, config.max_seq_len), jnp.int32)
    params = module.init(jax.random.PRNGKey(seed), ids)["params"]
    return module, params
