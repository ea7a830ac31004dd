"""Scaled-dot-product attention routing: the measured-faster of the Pallas
flash kernel and the XLA-fused naive form, decided by a live self-probe.

The naive form materializes the (batch, heads, q, k) score/prob tensors; the
flash kernel (jax.experimental.pallas.ops.tpu.flash_attention, custom-VJP
backward the capture engine's vjp traverses) tiles them away. Which is faster
is a PER-BACKEND EMPIRICAL QUESTION: measured 2026-08-20 on the tunneled v5e
at GPT-2 capture shapes (B=16, 12 heads, seq 512, head_dim 64), the flash
kernel is ~2x SLOWER end-to-end than XLA's own fusion of the naive form
(benchmarks/micro_cov.py capture floor: 338.8 ex/s naive vs 167.0 ex/s
flash) — XLA fuses the materialized-probs chain into the surrounding program
well at these dims, while the unfused flash bwd kernel dominates. So the
probe does not just check correctness, it TIMES both jitted forms and routes
to flash only when flash is measurably faster (>=10%).

Routing follows the repo's Pallas-kernel pattern (ops/pallas/syrk.py): a
static support check (backend, shape divisibility) plus a one-time self-probe
on the live device comparing forward AND backward against the naive reference
— Mosaic kernels can compile and still be wrong or crash per-backend, and a
mid-stage failure has no graceful fallback — then a timed A/B of both forms
as jitted fwd+bwd programs at a production-like shape. Opt-out:
KRON_FLASH_ATTN=0 (never flash); KRON_FLASH_ATTN=force routes to flash
whenever the correctness probe passes, skipping the timing gate.

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

# Default OFF — a measured decision, not a placeholder: on the tunneled v5e
# the Pallas flash kernel LOSES the timed A/B at GPT-2 dims (head_dim 64:
# naive 5.86 ms vs flash 6.68 ms isolated; 338.8 vs 167.0 ex/s inside the
# real capture program, benchmarks/micro_cov.py 2026-08-20), and at Llama
# dims (head_dim 128) its Mosaic compile did not return within 20 min on the
# remote compile server. Long-context check (2026-08-21, b=4 h=12 bf16
# fwd+bwd): naive also wins at seq 1024 (4.7 vs 7.0 ms) and seq 2048
# (10.0 vs 18.8 ms) — default-off holds across the long-context regime on
# this backend, not just at seq 512. KRON_FLASH_ATTN=1 opts into the
# probe+timed-A/B routing; =force skips the timing gate.
_FLASH_ENABLED = os.environ.get("KRON_FLASH_ATTN", "0") not in ("0", "")

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
            # The first call arrives DURING the model's jit trace, where JAX
            # stages every op — even on concrete arrays — into the ambient
            # trace, so the probe's float() comparisons would raise
            # ConcretizationTypeError (observed 2026-08-20: the flash path
            # silently fell back to naive in every jitted model).
            # jax.ensure_compile_time_eval() is not an escape here either —
            # the probe's custom-VJP + pallas_call raise NotImplementedError
            # under it. Trace contexts are thread-local, so a fresh thread IS
            # a clean eager context: run the probe there and join.
            import threading

            exc_box = []

            def probe_thread():
                try:
                    _run_probe(key, head_dim, dtype)
                except Exception as exc:  # noqa: BLE001 — re-raised below
                    exc_box.append(exc)

            th = threading.Thread(target=probe_thread, daemon=True)
            th.start()
            # Bounded join: the flash Mosaic compile at head_dim 128 did not
            # return within 20 min on this backend's remote compiler. A hung
            # probe must not wedge the production trace — time out, route
            # naive, and leave the daemon thread to be discarded.
            th.join(timeout=float(os.environ.get("KRON_FLASH_PROBE_TIMEOUT", "600")))
            if th.is_alive():
                raise TimeoutError("flash probe timed out")
            if exc_box:
                raise exc_box[0]
        except Exception as exc:  # kernel crash/compile failure/timeout -> naive
            _PROBED.setdefault(key, False)
            _log_route(key, f"flash probe raised ({type(exc).__name__}) -> naive path")
    return _PROBED[key]


def _run_probe(key, head_dim, dtype):
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
                jnp.abs(g_n.astype(jnp.float32) - g_f.astype(jnp.float32))
            )
        )
        ok = ok and (err <= tol * scale * 8)
    # setdefault everywhere: a timed-out probe (join deadline hit) already
    # recorded False for this key; a zombie probe thread finishing later must
    # not flip the routing mid-run.
    if not ok:
        _PROBED.setdefault(key, False)
        _log_route(key, "flash probe MISMATCHED naive -> naive path")
        return
    if os.environ.get("KRON_FLASH_ATTN") == "force":
        _PROBED.setdefault(key, True)
        _log_route(key, "flash probe passed, timing gate skipped (force) -> flash")
        return

    # Timed A/B at a production-like shape, both forms as ONE jitted fwd+bwd
    # program each (eager per-op dispatch would bill the naive form ~8 tunnel
    # round-trips per call and bias the race). Programs hit the persistent
    # compile cache after the first process.
    import time

    bb, hh, tt = 8, 8, 4 * _SEQ_MULTIPLE
    qb = jnp.asarray(rng.standard_normal((bb, hh, tt, head_dim)), dtype)
    mb = jnp.asarray(np.ones((bb, tt), np.int32))

    def timed(impl):
        def loss(q):
            out = impl(q, q, q, mb)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        step = jax.jit(jax.grad(loss))
        jax.block_until_ready(step(qb))  # compile + first run
        t0 = time.perf_counter()
        for _ in range(4):
            r = step(qb)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 4

    t_naive = timed(_naive_attention)
    t_flash = timed(_flash_attention)
    routed = _PROBED.setdefault(key, bool(t_flash < 0.9 * t_naive))
    _log_route(
        key,
        f"timed fwd+bwd at ({bb},{hh},{tt},{head_dim}): naive {t_naive*1e3:.2f}ms, "
        f"flash {t_flash*1e3:.2f}ms -> "
        + ("Pallas flash kernel" if routed else "naive path"),
    )


def _log_route(key, msg):
    # One line per (head_dim, dtype) per process: which attention path the
    # probe selected. Mirrored to stderr so bench logs capture it even when
    # the logger is unconfigured.
    import logging
    import sys

    logging.getLogger("kronfluence_tpu").info(
        "attention[head_dim=%s, %s]: %s", key[0], key[1], msg
    )
    print(f"attention[head_dim={key[0]}, {key[1]}]: {msg}", file=sys.stderr)


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
