"""Scaled-dot-product attention routing: Pallas flash kernel on TPU, naive on CPU.

The naive form materializes the (batch, heads, q, k) score/prob tensors —
~100 MB per GPT-2 layer at batch 16 / seq 512 in bf16, round-tripping HBM
several times in forward and more in backward. At ~45% model-level MFU the
capture pass is partly HBM-bound, so the tiled flash kernel (no materialized
probs; jax.experimental.pallas.ops.tpu.flash_attention, with a custom-VJP
backward the capture engine's vjp traverses) lifts EVERY stage that runs a
forward/backward: covariance, lambda, and both sides of scoring.

Routing follows the repo's Pallas-kernel pattern (ops/pallas/syrk.py): a
static support check (backend, shape divisibility) plus a one-time self-probe
on the live device comparing forward AND backward against the naive reference
at production-like shapes — Mosaic kernels can compile and still be wrong or
crash per-backend, and a mid-stage failure has no graceful fallback. Opt-out:
KRON_FLASH_ATTN=0.

Mask semantics (must match the naive path exactly at valid positions):
causal AND key-side `attention_mask`. The flash kernel expresses the key-side
mask as segment ids (q=mask, kv=mask): valid tokens (id 1) attend only to
valid tokens under the causal bound. The two forms differ ONLY at padded
query rows (naive lets a padded row attend to valid keys; segments do not) —
padded positions never reach factors or loss: every stage zeroes them via the
same attention mask, verified by tests/test_transformer.py's masked-parity
tests.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

_FLASH_ENABLED = os.environ.get("KRON_FLASH_ATTN", "1") != "0"

# Flash kernel seq-block granularity (jax pallas TPU kernel): both the
# q and kv sequence lengths must be multiples of the 128-lane block and at
# least 128 or the kernel's block-size assertions fire.
_SEQ_MULTIPLE = 128


def flash_supported(seq_len: int, head_dim: int) -> bool:
    """Static shape/backend gate for the flash path."""
    if not _FLASH_ENABLED:
        return False
    if jax.default_backend() == "cpu":
        return False
    if seq_len < _SEQ_MULTIPLE or seq_len % _SEQ_MULTIPLE:
        return False
    # Lane-aligned head dims only; GPT-2 (64) and Llama (128) both qualify.
    return head_dim in (64, 128, 256)


_PROBED = {}


def flash_works(head_dim: int, dtype) -> bool:
    """One-time per-(head_dim, dtype) live-device probe: forward and backward
    of the flash kernel must match the naive reference at valid positions."""
    key = (head_dim, jnp.dtype(dtype).name)
    if key not in _PROBED:
        try:
            import numpy as np

            b, h, t = 2, 2, 2 * _SEQ_MULTIPLE
            rng = np.random.default_rng(0)
            q = jnp.asarray(rng.standard_normal((b, h, t, head_dim)), dtype)
            k = jnp.asarray(rng.standard_normal((b, h, t, head_dim)), dtype)
            v = jnp.asarray(rng.standard_normal((b, h, t, head_dim)), dtype)
            mask = np.ones((b, t), np.int32)
            mask[1, t // 2 :] = 0  # one padded row block
            mask = jnp.asarray(mask)

            def run(impl, q, k, v):
                out = impl(q, k, v, mask)
                # Reduce over VALID positions only (padded q rows are the
                # one place the two formulations legitimately differ).
                w = mask[:, None, :, None].astype(jnp.float32)
                return jnp.sum(jnp.square(out.astype(jnp.float32)) * w)

            naive_val, naive_grads = jax.value_and_grad(
                partial(run, _naive_attention), argnums=(0, 1, 2)
            )(q, k, v)
            flash_val, flash_grads = jax.value_and_grad(
                partial(run, _flash_attention), argnums=(0, 1, 2)
            )(q, k, v)
            tol = 2e-2 if jnp.dtype(dtype) == jnp.bfloat16 else 2e-4
            ok = abs(float(naive_val) - float(flash_val)) <= tol * (
                abs(float(naive_val)) + 1.0
            )
            for g_n, g_f in zip(naive_grads, flash_grads):
                scale = float(jnp.max(jnp.abs(g_n.astype(jnp.float32)))) + 1e-6
                err = float(
                    jnp.max(
                        jnp.abs(
                            g_n.astype(jnp.float32) - g_f.astype(jnp.float32)
                        )
                    )
                )
                ok = ok and (err <= tol * scale * 8)
            _PROBED[key] = bool(ok)
        except Exception:
            _PROBED[key] = False
    return _PROBED[key]


def _naive_attention(q, k, v, attention_mask):
    """The materialized-probs reference: causal AND key-side mask — byte-for-
    byte the math every model in models/ used before flash routing."""
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


def _flash_attention(q, k, v, attention_mask):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    head_dim = q.shape[-1]
    segment_ids = None
    if attention_mask is not None:
        seg = attention_mask.astype(jnp.int32)
        segment_ids = SegmentIds(q=seg, kv=seg)
    return flash_attention(
        q,
        k,
        v,
        segment_ids=segment_ids,
        causal=True,
        sm_scale=1.0 / float(head_dim) ** 0.5,
    )


def scaled_dot_attention(q, k, v, attention_mask):
    """Causal masked attention over (batch, heads, seq, head_dim) operands.

    Routes to the flash kernel when the backend/shape gate and the live probe
    pass; otherwise runs the naive reference (identical math to the models'
    previous inline attention).
    """
    t, head_dim = q.shape[2], q.shape[3]
    if flash_supported(t, head_dim) and flash_works(head_dim, q.dtype):
        return _flash_attention(q, k, v, attention_mask)
    return _naive_attention(q, k, v, attention_mask)
