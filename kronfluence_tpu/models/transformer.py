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
        from kronfluence_tpu.ops.attention import scaled_dot_attention

        out = scaled_dot_attention(q, k, v, attention_mask)
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


# ---------------------------------------------------------------------------
# Scanned flagship: one block traced once, lax.scan over stacked layer params.
#
# The unrolled TransformerLM above traces num_layers copies of the block into
# the step HLO — fine for correctness, but cold-start compilation scales with
# layer count (the round-1 bench paid ~260 s compiling the 48-module
# covariance step). The production path scans ONE block over a stacked
# (L, ...) parameter pytree via `capture.functional.scan_layers`, which
# threads influence capture through the scan so per-layer factors still come
# out under the exact names the unrolled model produces (`h_3/mlp/c_fc`, ...).
# ---------------------------------------------------------------------------


def stack_layer_params(params: Any, num_layers: int) -> Any:
    """Convert unrolled TransformerLM params into the scanned layout.

    The per-layer subtrees ``h_0 .. h_{L-1}`` are stacked leaf-wise into one
    ``blocks`` subtree with a leading (L,) axis; everything else (embeddings,
    final norm, lm_head) is passed through unchanged.
    """
    layers = [params[f"h_{i}"] for i in range(num_layers)]
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in params.items() if not k.startswith("h_")}
    return {"blocks": blocks, **rest}


def scanned_lm_apply(config: TransformerConfig, remat: bool = False):
    """Functional GPT-2 forward over `stack_layer_params` params.

    Numerically identical to `TransformerLM.__call__` (same op sequence and
    dtype promotions as the flax modules), but the layer stack runs under
    `scan_layers`, so the traced program contains ONE block regardless of
    `num_layers`. Tracked module names match the unrolled model exactly.

    Returns an ``apply(params, input_ids, attention_mask=None) -> logits``
    function suitable for `prepare_model`.
    """
    from kronfluence_tpu import nn as knn
    from kronfluence_tpu.capture.functional import scan_layers

    cfg = config
    head_dim = cfg.d_model // cfg.num_heads

    def cast(p):
        return p.astype(cfg.dtype)

    def layer_norm(x, p):
        # flax LayerNorm semantics: stats in (at least) fp32, fast variance,
        # eps 1e-6, then scale/bias applied in the compute dtype.
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(cfg.dtype)
        return y * cast(p["scale"]) + cast(p["bias"])

    def attention(x, p, attention_mask):
        b, t, d = x.shape
        qkv = knn.linear(
            x, cast(p["c_attn"]["kernel"]), cast(p["c_attn"]["bias"]),
            name="attn/c_attn",
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        from kronfluence_tpu.ops.attention import scaled_dot_attention

        out = scaled_dot_attention(q, k, v, attention_mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return knn.linear(
            out, cast(p["c_proj"]["kernel"]), cast(p["c_proj"]["bias"]),
            name="attn/c_proj",
        )

    def mlp(x, p):
        h = knn.linear(
            x, cast(p["c_fc"]["kernel"]), cast(p["c_fc"]["bias"]), name="mlp/c_fc"
        )
        h = jax.nn.gelu(h)
        return knn.linear(
            h, cast(p["c_proj"]["kernel"]), cast(p["c_proj"]["bias"]),
            name="mlp/c_proj",
        )

    def apply(params, input_ids, attention_mask=None):
        t = input_ids.shape[1]
        tok = jnp.take(cast(params["wte"]["embedding"]), input_ids, axis=0)
        pos = jnp.take(
            cast(params["wpe"]["embedding"]), jnp.arange(t)[None], axis=0
        )
        x = tok + pos

        def body(h, layer):
            h = h + attention(layer_norm(h, layer["ln_1"]), layer["attn"], attention_mask)
            h = h + mlp(layer_norm(h, layer["ln_2"]), layer["mlp"])
            return h, None

        x, _ = scan_layers(body, x, params["blocks"], name_format="h_{i}", remat=remat)
        x = layer_norm(x, params["ln_f"])
        return jnp.matmul(x, cast(params["lm_head"]["kernel"]))

    return apply
