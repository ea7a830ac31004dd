"""Covariance accumulation math (MXU rank-k updates).

The reference accumulates `A^T A` / `G^T G` via `torch.addmm_`
(kronfluence/module/tracker/factor.py:58,93). Here each batch contributes a
single `dot_general` with `preferred_element_type` set to the accumulator
dtype, so bf16 operands accumulate in float32 on the MXU — faster *and* more
accurate than the reference's in-dtype accumulation.
"""

import os

import jax
import jax.numpy as jnp

# Pallas syrk (triangle-tile A^T A) opt-out for A/B measurement.
_SYRK_ENABLED = os.environ.get("KRON_SYRK", "1") != "0"


def gram(
    flat: jax.Array, accum_dtype, allow_syrk: bool = True, mesh=None
) -> jax.Array:
    """Returns `flat^T @ flat` with the requested accumulation dtype.

    Wide operands on TPU route through the Pallas syrk kernel
    (ops/pallas/syrk.py), which computes only lower-triangle tiles of the
    symmetric result (~0.55x the MXU FLOPs of XLA's full product).

    Args:
        allow_syrk: permits the Pallas kernel (A/B escape hatch).
        mesh: when the caller's rows are sharded over a device mesh, the
            kernel cannot be dispatched directly — a pallas_call has no SPMD
            partitioning rule, so the partitioner would all-gather the
            row-sharded operand onto every device. Passing the mesh routes
            it through shard_map instead: per-data-shard syrk + psum, the
            same decomposition the partitioner gives the XLA dot.
    """
    if _SYRK_ENABLED and allow_syrk:
        from kronfluence_tpu.ops.pallas.syrk import (
            syrk,
            syrk_supported,
            syrk_works,
        )

        if syrk_supported(flat.shape[-1], accum_dtype) and syrk_works():
            if mesh is None:
                return syrk(flat, accum_dtype)
            if _syrk_spmd_works(mesh):
                spmd = _syrk_psum(flat, accum_dtype, mesh)
                if spmd is not None:
                    return spmd
    return jax.lax.dot_general(
        flat,
        flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    )


_SPMD_WORKS = {}


def _syrk_spmd_works(mesh) -> bool:
    """Whether the syrk kernel compiles and runs correctly INSIDE shard_map
    on this mesh — probed once per mesh shape. The bare-kernel probe
    (syrk_works) does not cover Mosaic-under-shard_map compilation or the
    per-shard row regime, and a mid-stage compile failure has no graceful
    fallback; a failed probe demotes meshed grams to the partitioned XLA
    dot instead."""
    from kronfluence_tpu.parallel.mesh import DATA_AXIS

    key = tuple(sorted(mesh.shape.items()))
    if key not in _SPMD_WORKS:
        try:
            import numpy as np

            n_data = mesh.shape[DATA_AXIS]
            rows, n = n_data * 640, 4 * 512  # several K steps per shard
            a = (
                jnp.arange(rows * n, dtype=jnp.float32).reshape(rows, n) % 7.0
            ) - 3.0
            got = np.asarray(_syrk_psum(a, jnp.float32, mesh))
            want = np.asarray(a).T @ np.asarray(a)
            _SPMD_WORKS[key] = bool(
                got is not None and np.allclose(got, want, rtol=1e-4, atol=1e-2 * rows)
            )
        except Exception:
            _SPMD_WORKS[key] = False
    return _SPMD_WORKS[key]


def _syrk_psum(flat: jax.Array, accum_dtype, mesh):
    """Per-data-shard Pallas syrk + psum via shard_map (None if rows do not
    divide the data axis — the partitioned XLA dot handles that case)."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from kronfluence_tpu.ops.pallas import syrk as syrk_mod
    from kronfluence_tpu.parallel.mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    if flat.shape[0] % n_data != 0:
        return None

    def per_shard(f):
        return jax.lax.psum(syrk_mod.syrk(f, accum_dtype), DATA_AXIS)

    # Replication checking is off: pallas_call carries no replication
    # (vma) rule. Keyword differs across jax versions.
    try:
        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=P(DATA_AXIS, None),
            out_specs=P(None, None),
            check_vma=False,
        )(flat)
    except TypeError:  # pragma: no cover — older jax
        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=P(DATA_AXIS, None),
            out_specs=P(None, None),
            check_rep=False,
        )(flat)


def bordered_gram(
    a2: jax.Array, count, has_bias: bool, accum_dtype,
    allow_syrk: bool = True, mesh=None,
):
    """Gram of a masked activation with the bias ones-column assembled as an
    analytic border instead of a materialized concat.

    `[[A^T A, A^T 1], [1^T A, count]]` equals `gram([A | mask])` for a 0/1
    row mask already applied to A: the cross term is a plain column sum and
    the corner is the valid-row count. Keeping A at its native width
    preserves 128-lane alignment (768/3072 rather than 769/3073) for the
    MXU/syrk tiling.
    """
    G = gram(a2, accum_dtype, allow_syrk=allow_syrk, mesh=mesh)
    if not has_bias:
        return G
    col = jnp.sum(a2.astype(accum_dtype), axis=0)[:, None]
    corner = jnp.asarray(count, accum_dtype).reshape(1, 1)
    return jnp.block([[G, col], [col.T, corner]])


# Below this channel count the (C, C) offset blocks underfill the 128x128 MXU
# tile and the symmetric decomposition loses to one padded im2col gram.
_CONV_SYM_GRAM_MIN_CHANNELS = 128


def use_conv_sym_gram(spec) -> bool:
    """Whether `conv_activation_gram` beats an im2col gram for this layer."""
    k2 = spec.kernel_size[0] * spec.kernel_size[1]
    c = spec.in_dim // k2  # in_dim is C_in/groups * Kh * Kw
    return c >= _CONV_SYM_GRAM_MIN_CHANNELS and k2 > 1


def conv_activation_gram(spec, a, valid, dtype, accum_dtype):
    """Conv2d activation covariance without materializing im2col patches.

    The im2col gram `P^T P` (P: (rows, C*Kh*Kw)) is block-structured:
    block (o1, o2) equals `X_{o1}^T X_{o2}` where X_o is the input shifted by
    kernel offset o and cropped to the output positions. Since the gram is
    symmetric, only the Kh*Kw*(Kh*Kw+1)/2 upper-triangle blocks need an MXU
    contraction (45 instead of 81 for 3x3) and the mirrored blocks are plain
    transposes — ~1.8x fewer gram FLOPs than `gram(flatten_activation(...))`
    on top of skipping the (rows, C*Kh*Kw) patch materialization. Matches the
    reference conv2d.py:107-120 statistics exactly (same padding/stride
    semantics via the shared window slicer).

    Args:
        spec: conv2d LayerSpec.
        a: raw NHWC activation (batch, H, W, C_in).
        valid: optional (batch,) 0/1 sample mask (static-shape padding rows).
        dtype: operand dtype (matches flatten_activation's `dtype`).
        accum_dtype: accumulator dtype for the MXU contractions.

    Returns:
        (G, count): G is (D[+1], D[+1]) with D = C/groups * Kh * Kw in
        channel-major (c, kh, kw) feature order (+ bias row/col when the
        layer has a bias), count is the number of valid patch rows.
    """
    from kronfluence_tpu.ops.flatten import _expand_valid, conv2d_shift_windows

    x = a.astype(dtype)
    b = x.shape[0]
    if valid is not None:
        v = _expand_valid(valid, b).astype(dtype)
        x = x * v[:, None, None, None]
    windows, (out_h, out_w, c) = conv2d_shift_windows(x, spec)
    k2 = len(windows)
    rows = b * out_h * out_w
    W = [win.reshape(rows, c) for win in windows]

    blocks = {}
    for o1 in range(k2):
        for o2 in range(o1, k2):
            blocks[(o1, o2)] = jax.lax.dot_general(
                W[o1],
                W[o2],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=accum_dtype,
            )
    S = jnp.stack(
        [
            jnp.stack(
                [
                    blocks[(o1, o2)] if o1 <= o2 else blocks[(o2, o1)].T
                    for o2 in range(k2)
                ]
            )
            for o1 in range(k2)
        ]
    )  # (k2, k2, c, c)
    # Feature index is channel-major: f = c * k2 + o.
    G = S.transpose(2, 0, 3, 1).reshape(c * k2, c * k2)

    if valid is None:
        count = jnp.asarray(rows, dtype=jnp.int32)
    else:
        count = (jnp.sum(v.astype(jnp.int32)) * (out_h * out_w)).astype(jnp.int32)

    if spec.has_bias:
        # Bias column cross terms: per-offset column sums (invalid samples
        # are already zeroed in x); bias-bias entry counts valid rows.
        colsum = jnp.stack(
            [
                jnp.sum(w_.astype(accum_dtype), axis=0)
                for w_ in W
            ]
        )  # (k2, c)
        vb = colsum.T.reshape(c * k2, 1)
        corner = count.astype(accum_dtype).reshape(1, 1)
        G = jnp.block([[G, vb], [vb.T, corner]])
    return G, count


def per_sample_gradient(
    activation_tokens: jax.Array,  # (batch, tokens, in_dim[+1])
    gradient_tokens: jax.Array,  # (batch, tokens, out_dim)
    accum_dtype,
) -> jax.Array:
    """Per-sample weight gradients, shape (batch, out_dim, in_dim[+1]).

    Matches reference `compute_per_sample_gradient`
    (linear.py:70-77: einsum('b...i,b...o->bio')), with the summed-over-token
    contraction on the MXU.
    """
    return jnp.einsum(
        "bto,bti->boi",
        gradient_tokens,
        activation_tokens,
        preferred_element_type=accum_dtype,
    )


def conv_per_sample_gradient(
    spec,
    a: jax.Array,  # raw NHWC activation (batch, H, W, C_in)
    dy: jax.Array,  # raw NHWC output gradient (batch, OH, OW, C_out)
    valid,
    accum_dtype,
) -> jax.Array:
    """Per-sample conv weight gradients WITHOUT materializing im2col patches.

    Equivalent to `per_sample_gradient(activation_tokens_with_bias(...),
    gradient_tokens(...))` for conv2d specs, but expressed as a vmapped
    conv-backprop-filter: XLA lowers it to ONE grouped convolution
    (feature_group_count = batch), skipping the (batch, positions, C*Kh*Kw)
    patch buffer that dominates HBM traffic for large spatial layers.
    Returns (batch, out_dim, in_dim[+1]) in channel-major feature order.

    Experimental: not yet dispatched by the stage drivers (grouped-conv
    throughput on the MXU must be validated per generation first).
    """
    from kronfluence_tpu.ops.flatten import _expand_valid, _resolve_conv_pads

    x = a.astype(accum_dtype)
    g = dy.astype(accum_dtype)
    b, h, w, c = x.shape
    groups = spec.feature_group_count
    if groups > 1:
        x = x.reshape(b, h, w, groups, c // groups).mean(axis=3)
        c = c // groups
    if valid is not None:
        g = g * _expand_valid(valid, b).astype(g.dtype)[:, None, None, None]
    kh, kw = spec.kernel_size
    pads = _resolve_conv_pads(spec, h, w)
    w0 = jnp.zeros((kh, kw, c, spec.out_dim), accum_dtype)

    def filter_grad(xb, gb):
        def apply(wk):
            return jax.lax.conv_general_dilated(
                xb[None],
                wk,
                window_strides=spec.strides,
                padding=pads,
                rhs_dilation=spec.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=accum_dtype,
            )

        _, vjp = jax.vjp(apply, w0)
        return vjp(gb[None])[0]  # (kh, kw, c, out)

    dw = jax.vmap(filter_grad)(x, g)  # (b, kh, kw, c, out)
    # Channel-major feature order (c, kh, kw), matching im2col flattening.
    psg = dw.transpose(0, 4, 3, 1, 2).reshape(b, spec.out_dim, c * kh * kw)
    if spec.has_bias:
        bias = jnp.sum(g, axis=(1, 2))  # (b, out)
        psg = jnp.concatenate([psg, bias[:, :, None]], axis=-1)
    return psg


def summed_gradient(
    activation_tokens: jax.Array,
    gradient_tokens: jax.Array,
    accum_dtype,
) -> jax.Array:
    """Batch-summed weight gradient, shape (out_dim, in_dim[+1])."""
    return jnp.einsum(
        "bto,bti->oi",
        gradient_tokens,
        activation_tokens,
        preferred_element_type=accum_dtype,
    )
