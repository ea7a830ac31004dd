"""Multi-host (multi-process) runtime.

The reference's distributed runtime is a lazily-initialized NCCL process
group read from torchrun env vars (kronfluence/utils/state.py:36-44) plus
explicit collectives sprinkled through every stage. The TPU-native shape of
the same capability:

  * `initialize()` — `jax.distributed.initialize` from env vars
    (JAX/Cloud-TPU standard: auto-detected on TPU pods; explicit
    coordinator/process-count/process-id for CPU simulation or bare metal).
  * one global `Mesh` spanning all processes' devices (parallel/mesh.py
    already builds from `jax.devices()`, which is global after init);
  * per-process data feeding via `jax.make_array_from_process_local_data`
    (each host materializes only its shard of the global batch — the
    analogue of DistributedEvalSampler rank striding);
  * stage-boundary barriers via `multihost_utils.sync_global_devices` (the
    analogue of `dist.barrier`, reference utils/state.py:95-102);
  * process-0-gated logging and artifact saving (the analogue of
    MultiProcessAdapter, reference utils/logger.py:22-54).

Factor reductions need no explicit collectives at all: stage math is written
in global view and XLA inserts cross-host all-reduces from the sharding
annotations (they ride ICI/DCN as the mesh dictates).
"""

import os
from typing import Any, Optional

import jax
import numpy as np

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
) -> None:
    """Initializes the multi-process runtime (idempotent, single-process no-op).

    On TPU pods all arguments are auto-detected from the environment. For
    CPU-simulated multi-host tests, pass them explicitly (see
    tests/test_multihost.py).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    explicit = coordinator_address is not None or "JAX_COORDINATOR_ADDRESS" in os.environ
    auto_tpu = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not auto_tpu:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def num_processes() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def sync_global_devices(tag: str) -> None:
    """Barrier across all processes (no-op when single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def local_batch_slice(global_start: int, global_size: int) -> slice:
    """This process's contiguous slice of a global batch of `global_size`."""
    per = global_size // jax.process_count()
    r = jax.process_index()
    return slice(global_start + r * per, global_start + (r + 1) * per)


def make_global_batch(mesh, sharding, host_batch: Any) -> Any:
    """Builds global arrays from per-process local batch shards.

    `host_batch` holds only this process's rows; the returned arrays are
    global views sharded over the mesh data axis
    (`jax.make_array_from_process_local_data`).
    """
    def put(x):
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, arr)

    return jax.tree_util.tree_map(put, host_batch)
