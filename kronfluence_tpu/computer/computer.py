"""Computer base: output layout, argument/metadata persistence, loaders,
partition math, and factor loading.

Redesign of reference kronfluence/computer/computer.py:83-434 without the
DDP-wrapping/device bookkeeping (SPMD shardings replace it): the directory
layout `{output_dir}/{name}/factors_{fname}|scores_{sname}`, the
argument-conflict detection, and the strategy-requirements-driven
`load_all_factors` are preserved.
"""

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from kronfluence_tpu.arguments import Arguments, FactorArguments, ScoreArguments
from kronfluence_tpu.factor import io as factor_io
from kronfluence_tpu.factor.config import get_factor_config
from kronfluence_tpu.factor.covariance import discover_stage_specs
from kronfluence_tpu.parallel.mesh import data_axis_size
from kronfluence_tpu.prepare import PreparedModel, prepare_model
from kronfluence_tpu.task import Task
from kronfluence_tpu.utils.constants import (
    COVARIANCE_FACTOR_NAMES,
    EIGENDECOMPOSITION_FACTOR_NAMES,
    FACTOR_ARGUMENTS_NAME,
    FACTOR_SAVE_PREFIX,
    LAMBDA_FACTOR_NAMES,
    SCORE_ARGUMENTS_NAME,
    SCORE_SAVE_PREFIX,
)
from kronfluence_tpu.utils.dataset import (
    probe_first,
    BatchLoader,
    DataLoaderKwargs,
    ProgressLoader,
    dataset_length,
    dataset_metadata,
    make_indices_partition,
)
from kronfluence_tpu.utils.exceptions import FactorsNotFoundError
from kronfluence_tpu.utils.logger import PassThroughProfiler, Profiler, get_logger
from kronfluence_tpu.utils.save import load_json, save_json


class Computer:
    """Base orchestration: shared by FactorComputer and ScoreComputer."""

    def __init__(
        self,
        name: str,
        model: Any,
        task: Task,
        params: Any = None,
        mesh: Any = None,
        cpu: bool = False,
        log_level: Optional[int] = None,
        log_main_process_only: bool = True,
        profile: Any = False,
        disable_tqdm: bool = False,
        output_dir: str = "./influence_results",
    ) -> None:
        self.name = name
        self.task = task
        self.mesh = mesh
        self.model: PreparedModel = (
            model if isinstance(model, PreparedModel) else prepare_model(model, task)
        )
        if params is None:
            raise ValueError(
                "`params` (the model parameter pytree) must be provided to the Analyzer."
            )
        self.params = params
        self.cpu = cpu
        self.disable_tqdm = disable_tqdm
        # Background artifact writes (perform_eigendecomposition async_save).
        self._pending_saves: list = []
        self.logger = get_logger(
            type(self).__name__, log_level, main_process_only=log_main_process_only
        )
        if profile == "trace":
            from kronfluence_tpu.utils.logger import TraceProfiler

            self.profiler = TraceProfiler(str(Path(output_dir) / "profiler_output"))
        else:
            self.profiler = Profiler() if profile else PassThroughProfiler()
        self.output_dir = Path(output_dir).joinpath(name).resolve()
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._dataloader_params = DataLoaderKwargs()
        self._specs_cache: Optional[Dict[str, Any]] = None

    def _save_profile_summary(self, stage_name: str) -> None:
        """Persists the profiler table per stage (reference: computer.py:324-334
        writes `{output}/profiler_output/*_rank_{r}_{time}.txt`)."""
        if isinstance(self.profiler, PassThroughProfiler) and not isinstance(
            self.profiler, Profiler
        ):
            return
        summary = self.profiler.summary()
        if not summary:
            return
        import time as _time

        profile_dir = self.output_dir / "profiler_output"
        profile_dir.mkdir(parents=True, exist_ok=True)
        rank = jax.process_index()
        path = profile_dir / f"{stage_name}_rank_{rank}_{int(_time.time())}.txt"
        path.write_text(summary + "\n")
        self.logger.info(f"Saved profiler summary at {path}.")

    # -- Directory layout (reference: computer.py:127-133). --
    def factors_output_dir(self, factors_name: str) -> Path:
        return (self.output_dir / (FACTOR_SAVE_PREFIX + factors_name)).resolve()

    def scores_output_dir(self, scores_name: str) -> Path:
        return (self.output_dir / (SCORE_SAVE_PREFIX + scores_name)).resolve()

    # -- Argument / metadata persistence (reference: computer.py:135-191). --
    def _save_arguments(
        self,
        arguments_name: str,
        arguments: Arguments,
        output_dir: Path,
        overwrite_output_dir: bool,
    ) -> None:
        path = output_dir / f"{arguments_name}_arguments.json"
        arg_dict = arguments.to_dict()
        if path.exists() and not overwrite_output_dir:
            existing = load_json(path)
            # Compare on the key intersection: artifacts written by an older
            # library version lack newly-added fields; those run at their
            # defaults rather than invalidating the directory.
            shared = set(existing) & set(arg_dict)
            if {k: existing[k] for k in shared} != {k: arg_dict[k] for k in shared}:
                raise ValueError(
                    f"Found existing arguments at {path} that differ from the current "
                    "ones. Use `overwrite_output_dir=True` to overwrite."
                )
            if set(arg_dict) - set(existing):
                self.logger.info(
                    f"Existing arguments at {path} predate fields "
                    f"{sorted(set(arg_dict) - set(existing))}; continuing with defaults."
                )
        else:
            save_json(arg_dict, path)

    def _load_arguments(self, arguments_name: str, output_dir: Path) -> Optional[Dict]:
        path = output_dir / f"{arguments_name}_arguments.json"
        return load_json(path) if path.exists() else None

    def _save_dataset_metadata(
        self,
        dataset_name: str,
        dataset: Any,
        output_dir: Path,
        overwrite_output_dir: bool,
        indices: Optional[Sequence[int]] = None,
    ) -> None:
        path = output_dir / f"{dataset_name}_dataset_metadata.json"
        metadata = dataset_metadata(dataset, indices)
        if path.exists() and not overwrite_output_dir:
            existing = load_json(path)
            if existing != metadata:
                raise ValueError(
                    f"Found existing dataset metadata at {path} that differs from the "
                    "current dataset. Use `overwrite_output_dir=True` to overwrite."
                )
        else:
            save_json(metadata, path)

    # -- Loaders / batch sizing. --
    def global_batch_size(self, per_device_batch_size: int) -> int:
        return per_device_batch_size * data_axis_size(self.mesh)

    def _get_loader(
        self,
        dataset: Any,
        per_device_batch_size: Optional[int],
        indices: Optional[Sequence[int]] = None,
        initial_per_device_batch_size_attempt: int = 4096,
        dataloader_kwargs: Optional[DataLoaderKwargs] = None,
        stage: Optional[str] = None,
        factor_args: Any = None,
        score_args: Any = None,
    ) -> BatchLoader:
        total = len(indices) if indices is not None else dataset_length(dataset)
        if per_device_batch_size is None:
            per_device_batch_size = self._find_executable_batch_size(
                dataset, total, initial_per_device_batch_size_attempt,
                stage=stage, factor_args=factor_args, score_args=score_args,
            )
        loader = BatchLoader(
            dataset,
            self.global_batch_size(per_device_batch_size),
            indices,
            dataloader_kwargs=dataloader_kwargs or self._dataloader_params,
        )
        disable = self.disable_tqdm or jax.process_index() != 0
        return ProgressLoader(loader, desc="Batches", disable=disable)

    def _find_executable_batch_size(
        self,
        dataset: Any,
        total: int,
        initial_attempt: int,
        stage: Optional[str] = None,
        factor_args: Any = None,
        score_args: Any = None,
    ) -> int:
        """Analytic executable-batch-size estimate (utils/memory.py).

        XLA has no recoverable OOM, so the reference's run-and-halve search
        (utils/dataset.py:66-101) is replaced by a shape model built from the
        probe batch's true token counts, the stage's per-module structures,
        the remat / iterative-lambda flags, and the measured free HBM.
        """
        attempt = max(1, min(initial_attempt, total) // data_axis_size(self.mesh))
        try:
            from kronfluence_tpu.utils.memory import estimate_batch_size, probe_modules

            batch, _ = BatchLoader(dataset, 1).probe()
            probes = probe_modules(self.model, self.task, self.params, batch, 1)
            if not probes:
                raise FactorsNotFoundError("No tracked modules found in the model.")
            fit = estimate_batch_size(
                probes,
                stage or "covariance",
                params=self.params,
                factor_args=factor_args,
                score_args=score_args,
                max_batch_size=attempt,
            )
            if fit < attempt:
                self.logger.info(
                    f"Analytic memory estimate reduced per-device batch size "
                    f"{attempt} -> {fit} for stage {stage or 'covariance'!r}."
                )
            return fit
        except FactorsNotFoundError:
            raise
        except Exception as exc:  # estimation is best-effort; fall back to the clamp
            self.logger.info(f"Batch-size estimation failed ({exc!r}); using {attempt}.")
            return attempt

    # -- Module discovery / partitioning (reference: computer.py:250-316). --
    def _layer_specs(self, dataset: Any = None) -> Dict[str, Any]:
        if self._specs_cache is None:
            if dataset is None:
                raise RuntimeError(
                    "Tracked modules are unknown until a dataset has been seen; run a "
                    "factor/score stage first or pass a dataset."
                )
            loader = BatchLoader(dataset, 1)
            batch, _ = probe_first(loader)
            self._specs_cache = discover_stage_specs(
                self.model, self.task, self.params, batch, self.model.tracked_names
            )
            if not self._specs_cache:
                raise FactorsNotFoundError("No tracked modules found in the model.")
        return self._specs_cache

    def tracked_module_names(self, dataset: Any = None) -> List[str]:
        return sorted(self._layer_specs(dataset))

    def _partition_module_names(
        self, module_names: List[str], module_partitions: int
    ) -> List[List[str]]:
        return [list(chunk) for chunk in np.array_split(module_names, module_partitions)]

    # -- Factor loading (reference: computer.py:387-434). --
    def load_all_factors(self, factors_name: str) -> Dict[str, Dict[str, np.ndarray]]:
        """Loads every artifact the strategy needs for preconditioning."""
        factors_dir = self.factors_output_dir(factors_name)
        saved_args = self._load_arguments(FACTOR_ARGUMENTS_NAME, factors_dir)
        strategy = (saved_args or {}).get("strategy", "ekfac")
        config = get_factor_config(strategy)
        factors: Dict[str, Dict[str, np.ndarray]] = {}
        if config.requires_covariance_matrices_for_precondition:
            factors.update(factor_io.load_covariance_matrices(factors_dir))
        if config.requires_eigendecomposition_for_precondition:
            if not factor_io.eigendecomposition_exist(factors_dir):
                raise FactorsNotFoundError(
                    f"Eigendecomposition results not found in {factors_dir}."
                )
            factors.update(factor_io.load_eigendecomposition(factors_dir))
        if config.requires_lambda_matrices_for_precondition:
            if not factor_io.lambda_matrices_exist(factors_dir):
                raise FactorsNotFoundError(f"Lambda matrices not found in {factors_dir}.")
            factors.update(factor_io.load_lambda_matrices(factors_dir))
        return factors

    def _load_args_as(self, cls, arguments_name: str, output_dir: Path):
        """Persisted arguments JSON -> dataclass, dropping unknown fields
        (forward-compat with artifacts written by newer schemas)."""
        saved = self._load_arguments(arguments_name, output_dir)
        if saved is None:
            return None
        known = {f.name for f in cls.__dataclass_fields__.values()}
        return cls(**{k: v for k, v in saved.items() if k in known})

    def load_factor_args(self, factors_name: str) -> Optional[FactorArguments]:
        """Reference-named accessor (computer.py:336): the persisted
        FactorArguments of `factors_name`, or None when never fitted."""
        return self._load_args_as(
            FactorArguments, FACTOR_ARGUMENTS_NAME,
            self.factors_output_dir(factors_name),
        )

    def load_score_args(self, scores_name: str) -> Optional[ScoreArguments]:
        """Reference-named accessor (computer.py:365): the persisted
        ScoreArguments of `scores_name`, or None when never computed."""
        return self._load_args_as(
            ScoreArguments, SCORE_ARGUMENTS_NAME,
            self.scores_output_dir(scores_name),
        )

    def loaded_factor_args(self, factors_name: str) -> FactorArguments:
        """`load_factor_args` with a default-arguments fallback (the stage
        drivers' "use whatever the artifact was fitted with" path)."""
        return self.load_factor_args(factors_name) or FactorArguments()
