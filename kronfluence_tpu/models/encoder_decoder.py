"""Compact encoder-decoder transformer (T5-class) for seq2seq influence tasks.

Plays the role of the reference's T5/CNN-DailyMail workload
(examples/dailymail): separate encoder/decoder attention masks are routed to
modules via the dict form of `Task.get_attention_mask` (reference
task.py:83-99 — "a dictionary mapping module names to their corresponding
masks ... e.g. encoder-decoder architectures")."""

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EncDecConfig:
    vocab_size: int = 128
    max_seq_len: int = 32
    num_layers: int = 2
    num_heads: int = 2
    d_model: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def mlp_dim(self) -> int:
        return 4 * self.d_model


class MultiHeadAttention(nn.Module):
    config: EncDecConfig
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        kv_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        kv = x if kv is None else kv
        b, tq, d = x.shape
        tk = kv.shape[1]
        head_dim = d // cfg.num_heads
        q = nn.Dense(d, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="q")(x)
        k = nn.Dense(d, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="k")(kv)
        v = nn.Dense(d, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="v")(kv)

        def heads(z, t):
            return z.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q, tq), heads(k, tk), heads(v, tk)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(cfg.dtype)
        mask = jnp.ones((1, 1, tq, tk), dtype=bool)
        if self.causal:
            mask = mask & jnp.tril(jnp.ones((tq, tk), dtype=bool))[None, None]
        if kv_mask is not None:
            mask = mask & (kv_mask[:, None, None, :] > 0)
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return nn.Dense(d, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="o")(out)


class FeedForward(nn.Module):
    config: EncDecConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="wi")(x)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="wo")(
            jax.nn.relu(h)
        )


class EncoderBlock(nn.Module):
    config: EncDecConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        x = x + MultiHeadAttention(cfg, name="attn")(
            nn.LayerNorm(dtype=cfg.dtype, name="ln_1")(x), kv_mask=mask
        )
        return x + FeedForward(cfg, name="mlp")(nn.LayerNorm(dtype=cfg.dtype, name="ln_2")(x))


class DecoderBlock(nn.Module):
    config: EncDecConfig

    @nn.compact
    def __call__(self, x, enc, dec_mask, enc_mask):
        cfg = self.config
        x = x + MultiHeadAttention(cfg, causal=True, name="self_attn")(
            nn.LayerNorm(dtype=cfg.dtype, name="ln_1")(x), kv_mask=dec_mask
        )
        x = x + MultiHeadAttention(cfg, name="cross_attn")(
            nn.LayerNorm(dtype=cfg.dtype, name="ln_2")(x), kv=enc, kv_mask=enc_mask
        )
        return x + FeedForward(cfg, name="mlp")(nn.LayerNorm(dtype=cfg.dtype, name="ln_3")(x))


class EncDecLM(nn.Module):
    """Seq2seq LM: returns decoder logits (b, t_dec, vocab)."""

    config: EncDecConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        decoder_input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        decoder_attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        embed = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="shared"
        )
        pos = nn.Embed(
            cfg.max_seq_len, cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="wpe"
        )
        enc = embed(input_ids) + pos(jnp.arange(input_ids.shape[1])[None])
        for i in range(cfg.num_layers):
            enc = EncoderBlock(cfg, name=f"encoder_{i}")(enc, attention_mask)
        enc = nn.LayerNorm(dtype=cfg.dtype, name="encoder_ln")(enc)
        dec = embed(decoder_input_ids) + pos(jnp.arange(decoder_input_ids.shape[1])[None])
        for i in range(cfg.num_layers):
            dec = DecoderBlock(cfg, name=f"decoder_{i}")(
                dec, enc, decoder_attention_mask, attention_mask
            )
        dec = nn.LayerNorm(dtype=cfg.dtype, name="decoder_ln")(dec)
        return nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="lm_head",
        )(dec)


def init_encdec(config: EncDecConfig, seed: int = 0) -> Tuple[EncDecLM, Any]:
    module = EncDecLM(config)
    ids = jnp.zeros((1, config.max_seq_len), jnp.int32)
    params = module.init(jax.random.PRNGKey(seed), ids, ids)["params"]
    return module, params
