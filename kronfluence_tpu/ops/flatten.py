"""Flatten rules: map raw (activation, output-gradient) pairs to Kronecker form.

Implements the reference's per-module-type flattening semantics
(kronfluence/module/linear.py:30-61, conv2d.py:15-135) as pure functions:

  * linear: leading dims (batch, tokens, ...) collapse into rows; attention
    masks zero padded-token activations; bias handled by a ones column.
  * conv2d: im2col via `jax.lax.conv_general_dilated_patches` (NHWC, the
    TPU-native layout); spatial output positions become the "token" axis;
    channel groups are mean-reduced as in the reference.

Additionally every rule takes a per-sample `valid` mask (shape (batch,)).
Padded samples — which the TPU build uses to keep shapes static instead of
the reference's dynamic last batch — are exactly zeroed out of every
statistic, and counts use the true number of valid rows.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kronfluence_tpu.capture.specs import LayerSpec


def _expand_valid(valid: Optional[jax.Array], batch: int) -> Optional[jax.Array]:
    """Broadcasts a per-example valid mask onto a folded batch dim.

    Multiple-choice models fold choices into the batch (input (b, c, t) ->
    encoder sees (b*c, t), reference examples/swag/analyze.py:143-147), so a
    (b,) mask must repeat per choice. Contiguous example-major order is what
    a leading reshape produces.
    """
    if valid is None or valid.shape[0] == batch:
        return valid
    if batch % valid.shape[0] != 0:
        raise ValueError(
            f"valid mask of {valid.shape[0]} samples cannot map onto a module "
            f"batch of {batch} rows."
        )
    return jnp.repeat(valid, batch // valid.shape[0], axis=0)


def _row_mask(
    a_shape: Tuple[int, ...],
    attention_mask: Optional[jax.Array],
    valid: Optional[jax.Array],
    dtype,
    use_attention: bool,
) -> Optional[jax.Array]:
    """Builds a combined (rows, 1) mask over the flattened leading dims."""
    rows = 1
    for s in a_shape[:-1]:
        rows *= s
    mask = None
    if use_attention and attention_mask is not None and attention_mask.size == rows:
        mask = attention_mask.reshape(rows, 1).astype(dtype)
    if valid is not None:
        batch = a_shape[0]
        valid = _expand_valid(valid, batch)
        v = valid.astype(dtype).reshape((batch,) + (1,) * (len(a_shape) - 1))
        v = jnp.broadcast_to(v, a_shape[:-1] + (1,)).reshape(rows, 1)
        mask = v if mask is None else mask * v
    return mask


def _count_from(mask: Optional[jax.Array], rows: int) -> jax.Array:
    if mask is None:
        return jnp.asarray(rows, dtype=jnp.int32)
    return jnp.sum(mask.astype(jnp.int32))


def _resolve_conv_pads(spec: LayerSpec, h: int, w: int):
    """Resolves spec.padding to explicit ((lo,hi),(lo,hi)) pairs."""
    kh, kw = spec.kernel_size
    dh, dw = spec.kernel_dilation
    eff = ((kh - 1) * dh + 1, (kw - 1) * dw + 1)
    if isinstance(spec.padding, str):
        return jax.lax.padtype_to_pads((h, w), eff, spec.strides, spec.padding.upper())
    return [tuple(p) for p in spec.padding]


def conv2d_shift_windows(x: jax.Array, spec: LayerSpec):
    """Kh*Kw strided-slice views of a padded NHWC input, one per kernel
    offset, each of shape (batch, out_h, out_w, C_in/groups).

    Channel groups are mean-reduced first (reference: conv2d.py:55-57).
    Window `dy * kw + dx` holds, at output position p, the input value the
    kernel tap (dy, dx) reads when producing p — i.e. column (c, dy, dx) of
    the im2col matrix. Shared by im2col patch extraction and the
    patch-free symmetric covariance gram (ops/covariance.py)."""
    b, h, w, c = x.shape
    groups = spec.feature_group_count
    if groups > 1:
        x = x.reshape(b, h, w, groups, c // groups).mean(axis=3)
        c = c // groups
    kh, kw = spec.kernel_size
    sh, sw = spec.strides
    dh, dw = spec.kernel_dilation
    (ph_lo, ph_hi), (pw_lo, pw_hi) = _resolve_conv_pads(spec, h, w)
    xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    out_h = (hp - ((kh - 1) * dh + 1)) // sh + 1
    out_w = (wp - ((kw - 1) * dw + 1)) // sw + 1
    windows = []
    for dy in range(kh):
        for dx in range(kw):
            y0, x0 = dy * dh, dx * dw
            windows.append(
                jax.lax.slice(
                    xp,
                    (0, y0, x0, 0),
                    (b, y0 + (out_h - 1) * sh + 1, x0 + (out_w - 1) * sw + 1, c),
                    (1, sh, sw, 1),
                )
            )
    return windows, (out_h, out_w, c)


def extract_conv2d_patches(x: jax.Array, spec: LayerSpec) -> jax.Array:
    """im2col for NHWC inputs -> (batch, positions, C_in/groups * Kh * Kw).

    Patches are gathered with Kh*Kw static strided slices + one stack, NOT
    `jax.lax.conv_general_dilated_patches`: XLA lowers the latter as a conv
    with `feature_group_count = C` (group size 1), which cannot use the MXU
    and runs at VPU speed — on a v5e it was the bottleneck of the whole conv
    covariance stage. Feature ordering is channel-major (C, kh, kw), matching
    torch `F.unfold`, so conv factor artifacts stay cross-framework
    interchangeable (verified by tests/test_reference_parity_conv.py).
    """
    b = x.shape[0]
    windows, (out_h, out_w, c) = conv2d_shift_windows(x, spec)
    # Stack on the minor axis builds (b, oh, ow, c, kh*kw) — channel-major —
    # in one strided pass (stack-then-transpose would be two).
    p = jnp.stack(windows, axis=-1)
    return p.reshape(b, out_h * out_w, c * len(windows))


def _to_tokens(spec: LayerSpec, a: jax.Array) -> jax.Array:
    """Canonicalizes an activation to (batch, tokens, features)."""
    if spec.kind == "conv2d":
        return extract_conv2d_patches(a, spec)
    return a.reshape(a.shape[0], -1, a.shape[-1])


def _grad_to_tokens(spec: LayerSpec, dy: jax.Array) -> jax.Array:
    return dy.reshape(dy.shape[0], -1, dy.shape[-1])


def _append_bias_column(a2: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    ones = jnp.ones((a2.shape[0], 1), dtype=a2.dtype)
    if mask is not None:
        ones = ones * mask
    return jnp.concatenate([a2, ones], axis=-1)


def flatten_activation_parts(
    spec: LayerSpec,
    a: jax.Array,
    attention_mask: Optional[jax.Array],
    valid: Optional[jax.Array],
    dtype,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Masked (rows, in_dim) activation WITHOUT the bias ones-column, plus
    the (rows, 1) mask (None if unmasked) and the valid-row count.

    The covariance path assembles the bias row/column of the gram
    analytically from these parts (ops/covariance.py `bordered_gram`) instead
    of materializing the +1 concat: the copy is saved and the gram operand
    keeps its 128-lane-aligned width (768/3072, not 769/3073)."""
    use_attention = spec.kind == "linear"
    tokens = _to_tokens(spec, a.astype(dtype))
    rows = tokens.shape[0] * tokens.shape[1]
    a2 = tokens.reshape(rows, tokens.shape[-1])
    mask = _row_mask(tokens.shape, attention_mask, valid, dtype, use_attention)
    if mask is not None:
        a2 = a2 * mask
    return a2, mask, _count_from(mask, rows)


def flatten_activation(
    spec: LayerSpec,
    a: jax.Array,
    attention_mask: Optional[jax.Array],
    valid: Optional[jax.Array],
    dtype,
) -> Tuple[jax.Array, jax.Array]:
    """Flattens a raw activation for covariance: (rows, in_dim[+1]), count.

    Linear semantics follow reference linear.py:30-47 (attention mask zeroes
    padded activations and the bias ones-column; count = mask sum). Conv
    semantics follow conv2d.py:107-133 (no attention mask; count = rows).
    """
    a2, mask, count = flatten_activation_parts(spec, a, attention_mask, valid, dtype)
    if spec.has_bias:
        a2 = _append_bias_column(a2, mask)
    return a2, count


def flatten_gradient(
    spec: LayerSpec,
    dy: jax.Array,
    attention_mask: Optional[jax.Array],
    valid: Optional[jax.Array],
    dtype,
) -> Tuple[jax.Array, jax.Array]:
    """Flattens an output gradient: (rows, out_dim), count.

    The reference does not mask gradients by the attention mask (padded-token
    gradients are zero when the loss ignores them, linear.py:49-55), but we
    must zero rows of padding *samples* introduced by static-shape batching.
    """
    tokens = _grad_to_tokens(spec, dy.astype(dtype))
    rows = tokens.shape[0] * tokens.shape[1]
    g2 = tokens.reshape(rows, tokens.shape[-1])
    valid_mask = _row_mask(tokens.shape, None, valid, dtype, use_attention=False)
    if valid_mask is not None:
        g2 = g2 * valid_mask
    count_mask = _row_mask(
        tokens.shape, attention_mask, valid, dtype, use_attention=spec.kind == "linear"
    )
    return g2, _count_from(count_mask, rows)


def activation_tokens_with_bias(
    spec: LayerSpec, a: jax.Array, dtype
) -> jax.Array:
    """(batch, tokens, in_dim[+1]) activation for per-sample-gradient math.

    Mirrors reference `_flatten_input_activation` (linear.py:57-63): no
    attention masking here — padded-token gradients are zero, so masked
    activations are unnecessary for gradient reconstruction.
    """
    tokens = _to_tokens(spec, a.astype(dtype))
    if spec.has_bias:
        ones = jnp.ones(tokens.shape[:-1] + (1,), dtype=tokens.dtype)
        tokens = jnp.concatenate([tokens, ones], axis=-1)
    return tokens


def gradient_tokens(
    spec: LayerSpec, dy: jax.Array, valid: Optional[jax.Array], dtype
) -> jax.Array:
    """(batch, tokens, out_dim) output gradient, padding samples zeroed."""
    tokens = _grad_to_tokens(spec, dy.astype(dtype))
    if valid is not None:
        valid = _expand_valid(valid, tokens.shape[0])
        tokens = tokens * valid.astype(dtype)[:, None, None]
    return tokens
