"""Device-mesh and sharding utilities.

Replaces the reference's entire DDP/FSDP/NCCL layer (utils/state.py,
utils/model.py, all `dist.*` calls): one `jax.sharding.Mesh` with a `data`
axis (batch parallelism — DDP analogue) and a `model` axis (parameter/factor
sharding — FSDP/TP analogue). Stage math is written in global view; factor
reductions across data shards are inserted by XLA from the sharding
annotations, riding ICI instead of post-hoc NCCL reduces
(reference: module/tracker/factor.py:132-142).
"""

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a ('data', 'model') mesh over the available devices."""
    devices = list(devices) if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(
            f"Mesh {data}x{model} does not match {len(devices)} devices."
        )
    mesh_devices = np.asarray(devices).reshape(data, model)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def data_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return mesh.shape[DATA_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shards the leading (batch) axis of every leaf over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_params_fsdp(params: Any, mesh: Mesh) -> Any:
    """FSDP-style parameter placement: every matrix-valued leaf's LAST axis
    shards over the model axis (divisibility permitting); everything else
    replicates. The convenience analogue of the reference's
    `apply_fsdp(model)` (utils/model.py:58) — pair with factor_sharding for
    the factor state, as fit_factors.py/dryrun_multichip do.
    """
    model_axis = mesh.shape[MODEL_AXIS]

    def place(p):
        if getattr(p, "ndim", 0) >= 2 and p.shape[-1] % model_axis == 0:
            spec = P(*([None] * (p.ndim - 1) + [MODEL_AXIS]))
            return jax.device_put(p, NamedSharding(mesh, spec))
        return jax.device_put(p, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch: Any) -> Any:
    """Device-puts a host batch, sharding leading (batch) axes over the data
    axis; leaves that cannot be split evenly (scalars, metadata) replicate.

    Multi-host: each process holds only its local rows (see
    BatchLoader's process sharding); global arrays are assembled with
    `jax.make_array_from_process_local_data` — the analogue of the
    reference's DistributedEvalSampler striding + NCCL scatter
    (kronfluence/utils/dataset.py:104-145).
    """
    if mesh is None:
        return jax.device_put(batch)
    n = mesh.shape[DATA_AXIS]
    data_sharding = batch_sharding(mesh)
    replica = replicated(mesh)
    procs = jax.process_count()

    def put(x):
        if procs > 1:
            # Multi-host assembly needs host numpy shards.
            arr = np.asarray(x)
            if arr.ndim >= 1 and (arr.shape[0] * procs) % n == 0:
                return jax.make_array_from_process_local_data(data_sharding, arr)
            return jax.make_array_from_process_local_data(replica, arr)
        # Single-process: pass device-resident arrays straight to device_put —
        # XLA reshards on device. Round-tripping through np.asarray would be a
        # blocking device->host fetch per batch, defeating device-resident
        # column stores on meshed runs.
        arr = x if isinstance(x, jax.Array) else np.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % n == 0:
            return jax.device_put(arr, data_sharding)
        return jax.device_put(arr, replica)

    return jax.tree_util.tree_map(put, batch)


def device_prefetch(loader, mesh: Optional[Mesh], depth: int = 2):
    """Iterates a (batch, valid) loader with device-transfer lookahead.

    Issues `shard_batch` for up to `depth` upcoming batches before yielding
    the current one, so host->device transfers overlap the running step
    instead of adding latency between steps (JAX transfers are async; the
    lookahead just starts them early). All stage loops route through this."""
    import collections

    it = iter(loader)
    queue = collections.deque()

    def enqueue():
        try:
            batch, valid = next(it)
        except StopIteration:
            return False
        queue.append((shard_batch(mesh, batch), shard_batch(mesh, valid)))
        return True

    for _ in range(max(1, depth)):
        if not enqueue():
            break
    while queue:
        item = queue.popleft()
        enqueue()
        yield item


def factor_sharding(mesh: Mesh, shape: Sequence[int]) -> NamedSharding:
    """Sharding for a factor matrix: shard the leading dim over `model` when
    it divides evenly (large-layer FSDP analogue), else replicate."""
    model = mesh.shape[MODEL_AXIS]
    if len(shape) >= 2 and model > 1 and shape[0] % model == 0:
        return NamedSharding(mesh, P(MODEL_AXIS))
    return replicated(mesh)
