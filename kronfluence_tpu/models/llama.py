"""Llama-family decoder LM (RMSNorm + RoPE + GQA + SwiGLU), flax/TPU-native.

Plays the role of the reference's Llama-3-8B OpenWebText workload
(reference examples/openwebtext/fit_factors.py:82-88: MLP-only tracking,
bf16, extreme-reduce-memory recipe). Every projection is an `nn.Dense`
(no bias, Llama convention), so the capture interceptor tracks it under
flax paths like `layers_0/mlp/gate_proj` — the MLP-only filter selects
`mlp/{gate_proj,up_proj,down_proj}`.

`llama3_8b_config()` returns the real shapes (d_model 4096, d_mlp 14336,
32 heads / 8 KV heads); tests shrink every dimension but keep the
architecture.
"""

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    max_seq_len: int = 8192
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    d_model: int = 4096
    d_mlp: int = 14336
    rope_theta: float = 500_000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def llama3_8b_config(**overrides) -> LlamaConfig:
    """Real Llama-3-8B shapes (num_layers/vocab/seq shrinkable for probes)."""
    return LlamaConfig(**overrides)


def tiny_llama_config(**overrides) -> LlamaConfig:
    base = dict(
        vocab_size=128, max_seq_len=32, num_layers=2, num_heads=4,
        num_kv_heads=2, d_model=32, d_mlp=112, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    base.update(overrides)
    return LlamaConfig(**base)


class RMSNorm(nn.Module):
    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(stat_dtype)
        norm = xf * jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps
        )
        return (norm * scale.astype(stat_dtype)).astype(self.dtype)


def _rope(q: jax.Array, k: jax.Array, theta: float) -> Tuple[jax.Array, jax.Array]:
    """Rotary position embedding on (b, h, t, d) query/key tensors.

    Angles are computed in (at least) fp32 — fp64 when the model runs fp64, so
    the parity tests see true fp64 numerics."""
    d = q.shape[-1]
    t = q.shape[-2]
    angle_dtype = jnp.promote_types(q.dtype, jnp.float32)
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=angle_dtype) / d))
    angles = jnp.arange(t, dtype=angle_dtype)[:, None] * freqs[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)

    def rot(x):
        x1, x2 = x[..., 0::2], x[..., 1::2]
        xr1 = x1 * cos - x2 * sin
        xr2 = x2 * cos + x1 * sin
        out = jnp.stack([xr1, xr2], axis=-1).reshape(x.shape)
        return out.astype(x.dtype)

    return rot(q.astype(angle_dtype)).astype(q.dtype), rot(
        k.astype(angle_dtype)
    ).astype(k.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.config
        b, t, d = x.shape
        hd = cfg.head_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        q = dense(cfg.num_heads * hd, "q_proj")(x)
        k = dense(cfg.num_kv_heads * hd, "k_proj")(x)
        v = dense(cfg.num_kv_heads * hd, "v_proj")(x)
        q = q.reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, cfg.rope_theta)
        # GQA: repeat KV heads to match query heads.
        group = cfg.num_heads // cfg.num_kv_heads
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
        from kronfluence_tpu.ops.attention import scaled_dot_attention

        out = scaled_dot_attention(q, k, v, attention_mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return dense(d, "o_proj")(out)


class LlamaMLP(nn.Module):
    """SwiGLU: down(silu(gate(x)) * up(x)) — the reference's tracked modules."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        gate = dense(cfg.d_mlp, "gate_proj")(x)
        up = dense(cfg.d_mlp, "up_proj")(x)
        return dense(cfg.d_model, "down_proj")(nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.config
        x = x + LlamaAttention(cfg, name="attn")(
            RMSNorm(cfg.rms_eps, cfg.dtype, name="input_norm")(x), attention_mask
        )
        x = x + LlamaMLP(cfg, name="mlp")(
            RMSNorm(cfg.rms_eps, cfg.dtype, name="post_attn_norm")(x)
        )
        return x


class LlamaLM(nn.Module):
    """Decoder-only Llama; returns logits (b, t, vocab)."""

    config: LlamaConfig

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.config
        x = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="embed",
        )(input_ids)
        for i in range(cfg.num_layers):
            x = LlamaBlock(cfg, name=f"layers_{i}")(x, attention_mask)
        x = RMSNorm(cfg.rms_eps, cfg.dtype, name="final_norm")(x)
        return nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="lm_head",
        )(x)


def mlp_tracked_modules(num_layers: int) -> list:
    """Reference MLP-only tracking (examples/openwebtext/task.py:53-68)."""
    names = []
    for i in range(num_layers):
        for proj in ("gate_proj", "up_proj", "down_proj"):
            names.append(f"layers_{i}/mlp/{proj}")
    return names
