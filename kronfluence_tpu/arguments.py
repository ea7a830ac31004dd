"""Argument dataclasses for factor and score computations.

Field names and defaults mirror the reference (kronfluence/arguments.py:38-275)
so user configs port unchanged. dtype fields accept strings, numpy dtypes, or
jnp dtypes; they serialize to reference-compatible strings.

TPU-specific notes:
  * `amp_dtype` casts model params for the forward/backward (the autocast
    analogue); `amp_scale` applies GradScaler-style loss scaling when
    `amp_dtype` is float16 (bfloat16 needs no scaling, so it is inert there,
    matching the reference's `enabled=amp_dtype == torch.float16`).
  * `offload_activations_to_cpu` maps to whole-forward rematerialization
    (`jax.checkpoint`): on TPU, recomputing through the MXU is strictly
    cheaper than round-tripping activations over the host link.
"""

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from kronfluence_tpu.utils.dtypes import canonical_dtype_name


@dataclass
class Arguments:
    """Base class with JSON round-trip support."""

    def to_dict(self) -> Dict[str, Any]:
        config = {}
        for f in dataclasses.fields(self):
            value = getattr(self, f.name)
            if f.name.endswith("dtype"):
                value = canonical_dtype_name(value)
            config[f.name] = value
        return config

    def to_str_dict(self) -> Dict[str, str]:
        return {name: str(value) for name, value in self.to_dict().items()}


@dataclass
class FactorArguments(Arguments):
    """Arguments for fitting influence factors.

    Mirrors reference kronfluence/arguments.py:38-157.
    """

    # General configuration.
    strategy: str = "ekfac"
    use_empirical_fisher: bool = False
    amp_dtype: Optional[Any] = None
    amp_scale: float = 2.0**16  # Active for float16 autocast (see module docstring).
    # Accepted for reference config parity but a no-op here: shared-parameter
    # modules are auto-detected from trace-time use counts (capture/context.py),
    # so there is nothing to declare. See reference arguments.py:48.
    has_shared_parameters: bool = False
    # RNG seed for sampled-label (true Fisher) loss. The reference relies on
    # torch's implicit global RNG; JAX requires an explicit key.
    seed: int = 0

    # Covariance-matrix configuration.
    covariance_max_examples: Optional[int] = 100_000
    covariance_data_partitions: int = 1
    covariance_module_partitions: int = 1
    activation_covariance_dtype: Any = "float32"
    gradient_covariance_dtype: Any = "float32"

    # Eigendecomposition configuration. float64 runs on the host (LAPACK);
    # float32 runs on-device.
    eigendecomposition_dtype: Any = "float64"
    # On-device solver (TPU extension, no reference analogue): "qdwh" uses
    # XLA's built-in eigh (batched per merged dim group; one-time
    # multi-minute compile per shape, persisted in the compilation cache);
    # "dc" uses the host-driven batched spectral divide-and-conquer
    # (ops/eigh_dc.py — Newton-Schulz sign iterations, batched over all
    # same-shape factor matrices); "jacobi" uses the blocked-Jacobi solver
    # (ops/eigh.py). "auto" resolves to "qdwh" — measured comparisons and
    # per-group timings are recorded in benchmarks/README.md (QDWH solves
    # GPT-2's three merged groups in ~9 s steady; "dc" lost its A/B on this
    # backend: host-driven recursion is dominated by per-dispatch latency).
    # Llama-scale dims (>= LARGE_EIGH_DIM) take a separate per-matrix path
    # with its own solver knob (KF_LARGE_EIGH_SOLVER; see ops/eigh.py:
    # eigh_large and benchmarks/micro_eigh_llama.py for the measured
    # 14336-dim comparison). Ignored by the float64 host path.
    eigendecomposition_solver: str = "auto"

    # Lambda-matrix configuration.
    lambda_max_examples: Optional[int] = 100_000
    lambda_data_partitions: int = 1
    lambda_module_partitions: int = 1
    use_iterative_lambda_aggregation: bool = False
    offload_activations_to_cpu: bool = False
    per_sample_gradient_dtype: Any = "float32"
    lambda_dtype: Any = "float32"

    def __post_init__(self) -> None:
        if self.strategy not in ("identity", "diagonal", "kfac", "ekfac"):
            raise ValueError(f"Unknown strategy: {self.strategy!r}.")
        if self.eigendecomposition_solver not in ("auto", "qdwh", "jacobi", "dc"):
            raise ValueError(
                "`eigendecomposition_solver` must be 'auto', 'qdwh', 'jacobi', or 'dc'."
            )
        if self.eigendecomposition_solver == "dc":
            import logging

            logging.getLogger("kronfluence_tpu").warning(
                "eigendecomposition_solver='dc' is measured-pathological at "
                "moderate dims on this backend: the GPT-2 factor set did not "
                "finish in 580 s vs ~9 s for the default QDWH path "
                "(benchmarks/README.md, eigensolver table). Prefer 'auto'."
            )
        for name in ("covariance_max_examples", "lambda_max_examples"):
            value = getattr(self, name)
            if value is not None and value <= 0:
                raise ValueError(f"`{name}` must be positive or None.")
        for name in (
            "covariance_data_partitions",
            "covariance_module_partitions",
            "lambda_data_partitions",
            "lambda_module_partitions",
        ):
            if getattr(self, name) <= 0:
                raise ValueError(f"`{name}` must be positive.")


@dataclass
class ScoreArguments(Arguments):
    """Arguments for computing influence scores.

    Mirrors reference kronfluence/arguments.py:159-275.
    """

    # General configuration.
    damping_factor: Optional[float] = 1.0e-08
    amp_dtype: Optional[Any] = None
    offload_activations_to_cpu: bool = False

    # Partition configuration.
    data_partitions: int = 1
    module_partitions: int = 1

    # Score configuration.
    compute_per_module_scores: bool = False
    compute_per_token_scores: bool = False

    # Query-gradient batching configuration. The reference default (1) is
    # kept for config parity; `None` is a TPU extension meaning "size the
    # resident query block automatically from the analytic memory model"
    # (utils/memory.py:max_queries_per_block) — XLA has no recoverable OOM,
    # so the block must be sized right the first time.
    query_gradient_accumulation_steps: Optional[int] = 1
    query_gradient_low_rank: Optional[int] = None
    use_full_svd: bool = False

    # Gradient-aggregation configuration.
    aggregate_query_gradients: bool = False
    aggregate_train_gradients: bool = False

    # Self-influence configuration.
    use_measurement_for_self_influence: bool = False

    # dtype configuration.
    query_gradient_svd_dtype: Any = "float32"
    per_sample_gradient_dtype: Any = "float32"
    precondition_dtype: Any = "float32"
    score_dtype: Any = "float32"
    # TPU extension (no reference analogue): store each resident query-gradient
    # block in this dtype with one scale per (query, module) — float8 halves
    # the score stage's largest HBM resident vs bf16, so ~2x the queries fit
    # per block and the train loader is re-iterated half as often (see
    # ops/quantize.py). None keeps blocks in `score_dtype`. Ignored for blocks
    # compressed by `query_gradient_low_rank`.
    query_gradient_storage_dtype: Optional[Any] = None

    def __post_init__(self) -> None:
        if self.damping_factor is not None and self.damping_factor < 0:
            raise ValueError("`damping_factor` must be non-negative or None.")
        if self.query_gradient_storage_dtype is not None:
            from kronfluence_tpu.ops.quantize import STORAGE_DTYPES
            from kronfluence_tpu.utils.dtypes import canonical_dtype_name

            try:
                dt = canonical_dtype_name(self.query_gradient_storage_dtype)
            except ValueError:
                dt = str(self.query_gradient_storage_dtype)
            if dt not in STORAGE_DTYPES:
                raise ValueError(
                    "`query_gradient_storage_dtype` must be one of "
                    f"{STORAGE_DTYPES} or None, got {self.query_gradient_storage_dtype!r}."
                )
        for name in ("data_partitions", "module_partitions"):
            if getattr(self, name) <= 0:
                raise ValueError(f"`{name}` must be positive.")
        if (
            self.query_gradient_accumulation_steps is not None
            and self.query_gradient_accumulation_steps <= 0
        ):
            raise ValueError(
                "`query_gradient_accumulation_steps` must be positive or None (auto)."
            )
        if self.query_gradient_low_rank is not None and self.query_gradient_low_rank <= 0:
            raise ValueError("`query_gradient_low_rank` must be positive or None.")
