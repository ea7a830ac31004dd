"""ops/attention.py: routing gates and naive-path math.

The flash kernel itself cannot execute on the CPU backend (pallas TPU kernel,
interpret-only on CPU), so CPU CI pins the contract around it: the static
gate must refuse unsupported shapes/backends, the env default must keep flash
OFF (a measured decision — see the module docstring's 2026-08-20 A/B), and
the naive path must be exactly the models' previous inline attention math.
Flash-vs-naive numerics are enforced on the live TPU by the probe itself
(`_run_probe` raises or mismatches -> naive).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kronfluence_tpu.ops import attention as attn


def _reference_attention(q, k, v, attention_mask):
    # The inline math every model in models/ used before ops/attention.py
    # existed (models/transformer.py pre-30dfb80): materialized probs,
    # causal AND key-side mask.
    t = q.shape[2]
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(q.dtype)
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    mask = causal[None, None]
    if attention_mask is not None:
        mask = mask & (attention_mask[:, None, None, :] > 0)
    scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _operands(dtype=jnp.float32, b=2, h=2, t=16, d=8):
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    mask = np.ones((b, t), np.int32)
    mask[1, t // 2 :] = 0
    return q, k, v, jnp.asarray(mask)


def test_naive_matches_previous_inline_math():
    q, k, v, mask = _operands()
    got = attn.scaled_dot_attention(q, k, v, mask)
    want = _reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_naive_no_mask():
    q, k, v, _ = _operands()
    got = attn.scaled_dot_attention(q, k, v, None)
    want = _reference_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_grads_flow_through_routing():
    q, k, v, mask = _operands()

    def loss(q, k, v):
        out = attn.scaled_dot_attention(q, k, v, mask)
        w = mask[:, None, :, None].astype(jnp.float32)
        return jnp.sum(jnp.square(out.astype(jnp.float32)) * w)

    g_route = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        out = _reference_attention(q, k, v, mask)
        w = mask[:, None, :, None].astype(jnp.float32)
        return jnp.sum(jnp.square(out.astype(jnp.float32)) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_route, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_flash_disabled_by_default(monkeypatch):
    # The measured default: no flash unless explicitly opted in.
    assert attn._FLASH_ENABLED is False
    assert not attn.flash_supported(512, 64)


def test_static_gate_shapes(monkeypatch):
    monkeypatch.setattr(attn, "_FLASH_ENABLED", True)
    if jax.default_backend() == "cpu":
        # Backend gate wins on CPU regardless of shape.
        assert not attn.flash_supported(512, 64)
        return
    assert attn.flash_supported(512, 64)
    assert attn.flash_supported(256, 128)
    assert not attn.flash_supported(100, 64)  # not a 128 multiple
    assert not attn.flash_supported(64, 64)  # below the minimum block
    assert not attn.flash_supported(512, 96)  # unaligned head_dim


def test_timed_out_probe_is_not_overwritten(monkeypatch):
    # A zombie probe thread finishing after the join deadline must not flip
    # routing mid-run: the timeout's False wins via setdefault.
    key = (999, "float32")
    attn._PROBED[key] = False
    try:
        assert attn._PROBED.setdefault(key, True) is False
    finally:
        del attn._PROBED[key]
