"""Covariance-fitting stage driver.

Functional redesign of `fit_covariance_matrices_with_loader`
(reference: kronfluence/factor/covariance.py:153-266). One jitted step
captures all per-layer (activation, output-gradient) pairs via a single vjp
and folds the `A^T A` / `G^T G` rank-k updates into the same XLA program as
the model forward/backward — the reference's forward/backward hooks, GradScaler
plumbing, `no_sync`, periodic barriers, and end-of-stage `dist.reduce` all
disappear: cross-device reduction is inserted by XLA from the sharding
annotations (batch sharded over the mesh data axis, factor state replicated).
"""

from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.capture.engine import capture, discover_specs
from kronfluence_tpu.ops.covariance import (
    bordered_gram,
    conv_activation_gram,
    gram,
    use_conv_sym_gram,
)
from kronfluence_tpu.ops.flatten import flatten_activation_parts, flatten_gradient
from kronfluence_tpu.parallel.mesh import device_prefetch, factor_sharding, replicated, shard_batch
from kronfluence_tpu.prepare import PreparedModel
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.constants import (
    ACTIVATION_COVARIANCE_MATRIX_NAME,
    GRADIENT_COVARIANCE_MATRIX_NAME,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
    NUM_GRADIENT_COVARIANCE_PROCESSED,
)
from kronfluence_tpu.utils.dtypes import accumulation_dtype, resolve_dtype


def _attention_mask_for(module_name: str, masks: Any) -> Optional[jax.Array]:
    if masks is None:
        return None
    if isinstance(masks, dict):
        return masks.get(module_name)
    return masks


def cast_params(params: Any, amp_dtype: Any) -> Any:
    """Autocast analogue: casts floating params to `amp_dtype` for the model
    forward/backward (reference: torch.autocast in factor/covariance.py:218).
    Factor/score accumulation dtypes are controlled separately."""
    if amp_dtype is None:
        return params
    dtype = resolve_dtype(amp_dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def loss_scale_for(amp_dtype, amp_scale) -> "Optional[float]":
    """GradScaler analogue: active only for float16 autocast (bf16 needs no
    scaling; reference enables GradScaler iff amp_dtype == float16)."""
    if amp_dtype is None or amp_scale in (None, 1.0):
        return None
    from kronfluence_tpu.utils.dtypes import resolve_dtype

    if resolve_dtype(amp_dtype) == jnp.float16:
        return float(amp_scale)
    return None


def train_loss_forward(
    model: PreparedModel,
    task: Task,
    params: Any,
    batch: Any,
    sample: bool,
    rng: Optional[jax.Array],
):
    """Builds the zero-arg loss closure captured by the engine."""

    def forward():
        return task.compute_train_loss(batch, model.bind(params), sample=sample, rng=rng)

    return forward


def discover_stage_specs(
    model: PreparedModel,
    task: Task,
    params: Any,
    batch: Any,
    tracked_names: Optional[Sequence[str]],
):
    """Host-side abstract discovery of tracked-layer specs on an example batch."""
    rng = jax.random.PRNGKey(0)
    forward = train_loss_forward(model, task, params, batch, sample=False, rng=rng)
    specs, _ = discover_specs(forward, tracked_names)
    return specs


def _make_covariance_update(
    model, task, tracked_key_, act_dtype, grad_dtype, sample,
    amp_dtype=None, remat=False, amp_scale=None, mesh=None,
):
    """Pure per-batch update shared by the jitted step and the scanned loop.

    Meshed (SPMD-sharded) steps pass `mesh` so the Pallas syrk kernel routes
    through shard_map (per-data-shard syrk + psum) — a bare pallas_call has
    no partitioning rule and would force an all-gather of the sharded rows.
    """
    act_accum = accumulation_dtype(act_dtype)
    grad_accum = accumulation_dtype(grad_dtype)
    tracked = list(tracked_key_) if tracked_key_ is not None else None
    scale = loss_scale_for(amp_dtype, amp_scale)

    def update(state, params, batch, valid, rng):
        params = cast_params(params, amp_dtype)
        forward = train_loss_forward(model, task, params, batch, sample, rng)
        _, captures = capture(forward, tracked, remat=remat, loss_scale=scale)
        masks = task.get_attention_mask(batch)
        for name, cap in captures.items():
            spec = cap.spec
            att = _attention_mask_for(name, masks)
            mod_state = state[name]
            for a, dy in zip(cap.activations, cap.output_gradients):
                if spec.kind == "conv2d" and use_conv_sym_gram(spec):
                    # Patch-free symmetric-block gram (ops/covariance.py):
                    # ~1.8x fewer MXU FLOPs than gram(im2col) for 3x3 kernels.
                    a_gram, count_a = conv_activation_gram(
                        spec, a, valid, act_dtype, act_accum
                    )
                else:
                    # Bias column as an analytic border: no (rows, d+1)
                    # concat copy, and the gram operand stays 128-aligned.
                    a2, _, count_a = flatten_activation_parts(
                        spec, a, att, valid, act_dtype
                    )
                    a_gram = bordered_gram(
                        a2, count_a, spec.has_bias, act_accum, mesh=mesh,
                    )
                mod_state[ACTIVATION_COVARIANCE_MATRIX_NAME] += a_gram
                mod_state[NUM_ACTIVATION_COVARIANCE_PROCESSED] += count_a.astype(
                    mod_state[NUM_ACTIVATION_COVARIANCE_PROCESSED].dtype
                )
                g_flat, count_g = flatten_gradient(spec, dy, att, valid, grad_dtype)
                mod_state[GRADIENT_COVARIANCE_MATRIX_NAME] += gram(
                    g_flat, grad_accum, mesh=mesh
                )
                mod_state[NUM_GRADIENT_COVARIANCE_PROCESSED] += count_g.astype(
                    mod_state[NUM_GRADIENT_COVARIANCE_PROCESSED].dtype
                )
        return state

    return update


def _build_covariance_step(
    model, task, tracked_key_, act_dtype, grad_dtype, sample, mesh,
    amp_dtype=None, remat=False, out_shardings=None, amp_scale=None,
):
    update = _make_covariance_update(
        model, task, tracked_key_, act_dtype, grad_dtype, sample,
        amp_dtype, remat, amp_scale, mesh=mesh,
    )
    return partial(jax.jit, donate_argnums=(0,), out_shardings=out_shardings)(update)


def fit_covariance_matrices_with_loader(
    model: PreparedModel,
    params: Any,
    task: Task,
    loader,
    factor_args: Optional[FactorArguments] = None,
    tracked_names: Optional[Sequence[str]] = None,
    mesh=None,
    profiler=None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Fits activation/gradient covariance over all batches of `loader`."""
    from kronfluence_tpu.utils.jit_cache import cached_step, tracked_key

    from kronfluence_tpu.utils.logger import PassThroughProfiler

    factor_args = factor_args or FactorArguments()
    profiler = profiler or PassThroughProfiler()
    tracked_names = tracked_names if tracked_names is not None else model.tracked_names
    act_dtype = resolve_dtype(factor_args.activation_covariance_dtype)
    grad_dtype = resolve_dtype(factor_args.gradient_covariance_dtype)
    act_accum = accumulation_dtype(act_dtype)
    grad_accum = accumulation_dtype(grad_dtype)
    sample = not factor_args.use_empirical_fisher
    base_rng = jax.random.PRNGKey(factor_args.seed)

    from kronfluence_tpu.utils.dataset import probe_first

    try:
        first_batch, first_valid = probe_first(loader)
    except StopIteration:
        raise ValueError("Empty loader for covariance fitting.")

    with profiler.profile("Covariance: discover specs"):
        specs = discover_stage_specs(model, task, params, first_batch, tracked_names)

    state = {
        name: {
            ACTIVATION_COVARIANCE_MATRIX_NAME: jnp.zeros(
                (spec.activation_dim, spec.activation_dim), act_accum
            ),
            GRADIENT_COVARIANCE_MATRIX_NAME: jnp.zeros(
                (spec.gradient_dim, spec.gradient_dim), grad_accum
            ),
            NUM_ACTIVATION_COVARIANCE_PROCESSED: jnp.zeros((), jnp.int32),
            NUM_GRADIENT_COVARIANCE_PROCESSED: jnp.zeros((), jnp.int32),
        }
        for name, spec in specs.items()
    }
    out_shardings = None
    if mesh is not None:
        # Large factor matrices shard their leading dim over the model axis
        # (the Llama-scale case where replication would blow HBM, reference
        # examples/openwebtext/fit_factors.py:82-88); small ones replicate.
        # Donated inputs must already live with the output shardings.
        out_shardings = jax.tree_util.tree_map(
            lambda x: factor_sharding(mesh, x.shape), state
        )
        state = jax.device_put(state, out_shardings)

    amp_dtype = factor_args.amp_dtype
    remat = factor_args.offload_activations_to_cpu
    tkey = tracked_key(tracked_names)
    sig = (
        "covariance", model.task_key(task), tkey, str(act_dtype), str(grad_dtype),
        sample, mesh, str(amp_dtype), remat,
    )

    from kronfluence_tpu.utils.scan_loop import run_scanned, scan_plan, scanned_superstep

    plan = scan_plan(loader, mesh)
    if plan is not None:
        # Device-resident data, no mesh: run the whole loop on device in
        # fixed-length scan chunks — one dispatch per chunk instead of ~5
        # per batch (see utils/scan_loop.py).
        superstep = cached_step(
            model,
            sig + ("scan", plan.batch_size),
            lambda: scanned_superstep(
                _make_covariance_update(
                    model, task, tkey, act_dtype, grad_dtype, sample,
                    amp_dtype, remat, factor_args.amp_scale,
                ),
                plan.batch_size,
            ),
        )
        with profiler.profile("Covariance: scanned batch loop"):
            state = run_scanned(
                plan,
                state,
                lambda st, cols, starts, nv, idxs: superstep(
                    st, params, cols, starts, nv, idxs, base_rng
                ),
                progress_desc="Fitting covariance matrices",
            )
        with profiler.profile("Covariance: device sync"):
            jax.block_until_ready(state)
    else:
        step = cached_step(
            model,
            sig,
            lambda: _build_covariance_step(
                model, task, tkey, act_dtype, grad_dtype, sample, mesh, amp_dtype,
                remat, out_shardings, factor_args.amp_scale,
            ),
        )

        step_idx = 0

        def run_batch(batch, valid):
            nonlocal state, step_idx
            rng = jax.random.fold_in(base_rng, step_idx)
            state = step(state, params, batch, valid, rng)
            step_idx += 1

        loader_iter = iter(loader)
        first_batch, first_valid = next(loader_iter)
        with profiler.profile("Covariance: first step (compile)"):
            run_batch(shard_batch(mesh, first_batch), shard_batch(mesh, first_valid))
        with profiler.profile("Covariance: batch loop"):
            for batch, valid in device_prefetch(loader_iter, mesh):
                run_batch(batch, valid)
        with profiler.profile("Covariance: device sync"):
            jax.block_until_ready(state)

    # Assemble the factor dict (factor_name -> module -> array) in the
    # requested artifact dtypes. Results stay ON DEVICE: the eigendecomposition
    # and lambda stages consume them in place, and the host<->device link is
    # the scarcest resource on tunneled TPU backends (~50 MB/s here). The save
    # path (`factor/io.py`) bulk-fetches to host when persisting.
    result: Dict[str, Dict[str, Any]] = {
        ACTIVATION_COVARIANCE_MATRIX_NAME: {},
        GRADIENT_COVARIANCE_MATRIX_NAME: {},
        NUM_ACTIVATION_COVARIANCE_PROCESSED: {},
        NUM_GRADIENT_COVARIANCE_PROCESSED: {},
    }
    for name, mod_state in state.items():
        result[ACTIVATION_COVARIANCE_MATRIX_NAME][name] = mod_state[
            ACTIVATION_COVARIANCE_MATRIX_NAME
        ].astype(act_dtype)
        result[GRADIENT_COVARIANCE_MATRIX_NAME][name] = mod_state[
            GRADIENT_COVARIANCE_MATRIX_NAME
        ].astype(grad_dtype)
        result[NUM_ACTIVATION_COVARIANCE_PROCESSED][name] = mod_state[
            NUM_ACTIVATION_COVARIANCE_PROCESSED
        ].reshape((1,))
        result[NUM_GRADIENT_COVARIANCE_PROCESSED][name] = mod_state[
            NUM_GRADIENT_COVARIANCE_PROCESSED
        ].reshape((1,))
    return result
