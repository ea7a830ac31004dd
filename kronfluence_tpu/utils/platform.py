"""Platform setup: persistent XLA compilation cache and host transfer helpers.

TPU backends (especially remote/tunneled ones) have two costs absent on the
reference's local-CUDA setup: multi-minute XLA compiles and a slow,
high-latency host<->device link. Two mitigations live here:

  * `enable_persistent_cache` — on-disk XLA executable cache so stage programs
    compile once per machine, not once per process (first compile of the
    GPT-2 covariance step is ~2 minutes; a cache hit is seconds).
  * `fetch_tree` — bulk device->host transfer: start async copies for every
    leaf first, then gather. Sequential `np.asarray` per leaf costs a full
    link round-trip each (tens of ms here), which for a 192-leaf factor state
    multiplies into tens of seconds.
"""

import os
from typing import Any, Optional

import jax

_CACHE_ENABLED = False


def is_tpu_backend() -> bool:
    """True when compute runs on TPU hardware (incl. tunneled TPU plugins
    whose platform name differs from "tpu"): gates Pallas kernel paths."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        return True
    try:
        return "tpu" in str(jax.devices()[0].device_kind).lower()
    except Exception:
        return False


_PALLAS_WORKS: Optional[bool] = None


def pallas_works() -> bool:
    """Whether compiled (non-interpret) Pallas kernels actually run on this
    backend — probed once per process with a trivial kernel and cached.

    Tunneled TPU plugins may report TPU hardware without supporting the
    Mosaic compilation path; production Pallas dispatch (syrk gram, Jacobi
    pivot solve) must fall back to plain XLA rather than fail mid-stage."""
    global _PALLAS_WORKS
    if _PALLAS_WORKS is None:
        if not is_tpu_backend():
            _PALLAS_WORKS = False
        else:
            try:
                import jax.numpy as jnp
                from jax.experimental import pallas as pl

                def _copy(src, dst):
                    dst[:] = src[:] + 1.0

                out = pl.pallas_call(
                    _copy,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(jnp.zeros((8, 128), jnp.float32))
                _PALLAS_WORKS = bool(float(out[0, 0]) == 1.0)
            except Exception:
                _PALLAS_WORKS = False
    return _PALLAS_WORKS


def enable_persistent_cache(path: Optional[str] = None) -> None:
    """Enables the on-disk XLA compilation cache (idempotent).

    Honors `KRONFLUENCE_TPU_CACHE_DIR`; set it to "0" / "off" to disable.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    env = os.environ.get("KRONFLUENCE_TPU_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return
    # Respect a cache another layer already configured (e.g. the test
    # conftest's tests/.jax_test_cache with min_compile_time 0): silently
    # redirecting it from a library constructor would both move the cache and
    # stop caching sub-2s compiles, defeating that layer's setup.
    if jax.config.jax_compilation_cache_dir:
        _CACHE_ENABLED = True
        return
    cache_dir = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "kronfluence_tpu_xla"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except OSError as exc:  # read-only/unset HOME: run uncached, don't raise
        import logging

        logging.getLogger(__name__).warning(
            "persistent XLA cache disabled (cannot create %s: %s)", cache_dir, exc
        )
        return
    _CACHE_ENABLED = True


def fetch_tree(tree: Any) -> Any:
    """Transfers a pytree of device arrays to host numpy in one bulk fetch."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_deleted():
            try:
                leaf.copy_to_host_async()
            except Exception:  # some backends lack async copies
                pass
    return jax.device_get(tree)
