"""Analyzer: top-level user API (parity with reference kronfluence/analyzer.py).

`Analyzer` multiply-inherits the factor and score computers, mirroring
`class Analyzer(FactorComputer, ScoreComputer)` (reference analyzer.py:48).
"""

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.computer.factor_computer import FactorComputer
from kronfluence_tpu.computer.score_computer import ScoreComputer
from kronfluence_tpu.prepare import prepare_model  # noqa: F401  (re-export)
from kronfluence_tpu.utils.dataset import DataLoaderKwargs
from kronfluence_tpu.utils.save import load_file, save_file


class Analyzer(FactorComputer, ScoreComputer):
    """Handles computation of influence factors and scores for a prepared model."""

    def __init__(
        self,
        analysis_name: str,
        model: Any,
        task: Any,
        params: Any = None,
        mesh: Any = None,
        cpu: bool = False,
        log_level: Optional[int] = None,
        log_main_process_only: bool = True,
        profile: bool = False,
        disable_tqdm: bool = False,
        output_dir: str = "./influence_results",
        disable_model_save: bool = True,
    ) -> None:
        super().__init__(
            name=analysis_name,
            model=model,
            task=task,
            params=params,
            mesh=mesh,
            cpu=cpu,
            log_level=log_level,
            log_main_process_only=log_main_process_only,
            profile=profile,
            disable_tqdm=disable_tqdm,
            output_dir=output_dir,
        )
        # On-disk XLA executable cache (KRONFLUENCE_TPU_CACHE_DIR=off to
        # disable): a preempted run that resumes from partitioned/per-matrix
        # artifacts must not re-pay minutes of stage compiles — at Llama dims
        # the large-eigh sweep program alone is a ~450 s compile (recorded
        # 2026-08-21 8B-shape run), larger than many of the solves it guards.
        from kronfluence_tpu.utils.platform import enable_persistent_cache

        enable_persistent_cache()
        if not disable_model_save:
            self._save_model()

    def set_dataloader_kwargs(self, dataloader_kwargs: DataLoaderKwargs) -> None:
        self._dataloader_params = dataloader_kwargs

    def _save_model(self) -> None:
        """Persists (and on rerun verifies) the analyzed parameters."""
        from kronfluence_tpu.utils.save import verify_models_equivalence

        model_save_path = self.output_dir / "model.safetensors"
        flat = _flatten_params(self.params)
        if model_save_path.exists():
            loaded = load_file(model_save_path)
            if not verify_models_equivalence(loaded, flat):
                raise ValueError(
                    "Previously saved model parameters differ from the current "
                    "parameters. Provide a different `analysis_name`."
                )
            return
        save_file(flat, model_save_path)

    def fit_all_factors(
        self,
        factors_name: str,
        dataset: Any,
        per_device_batch_size: Optional[int] = None,
        initial_per_device_batch_size_attempt: int = 4096,
        dataloader_kwargs: Optional[DataLoaderKwargs] = None,
        factor_args: Optional[FactorArguments] = None,
        overwrite_output_dir: bool = False,
    ) -> None:
        """Computes all necessary factors: covariance -> eigh -> lambda
        (reference analyzer.py:144-195).

        The eigendecomposition is handed to the Lambda stage in memory and its
        artifacts are written on a background thread: on the fp32 device path
        the eigen factors are device arrays whose solves may still be in
        flight when the Lambda stage starts building loaders and compiling its
        step, so the solver tail, the host fetch + safetensors write, and the
        Lambda stage's host-side pipeline all overlap — eigendecomposition
        comes off the end-to-end critical path (its wall time hides behind
        Lambda's warmup; reference serializes the stages and pays cuSOLVER
        in full, factor/eigen.py:199-213)."""
        self.fit_covariance_matrices(
            factors_name=factors_name,
            dataset=dataset,
            per_device_batch_size=per_device_batch_size,
            initial_per_device_batch_size_attempt=initial_per_device_batch_size_attempt,
            dataloader_kwargs=dataloader_kwargs,
            factor_args=factor_args,
            overwrite_output_dir=overwrite_output_dir,
        )
        eigen_factors = self.perform_eigendecomposition(
            factors_name=factors_name,
            factor_args=factor_args,
            overwrite_output_dir=overwrite_output_dir,
            return_in_memory=True,
            async_save=True,
        )
        try:
            self.fit_lambda_matrices(
                factors_name=factors_name,
                dataset=dataset,
                per_device_batch_size=per_device_batch_size,
                initial_per_device_batch_size_attempt=initial_per_device_batch_size_attempt,
                dataloader_kwargs=dataloader_kwargs,
                factor_args=factor_args,
                overwrite_output_dir=overwrite_output_dir,
                eigen_factors=eigen_factors,
            )
        finally:
            self.wait_for_async_saves()

    @staticmethod
    def load_file(path: Path) -> Dict[str, np.ndarray]:
        """Loads a safetensors artifact file (reference analyzer.py:197-220)."""
        return load_file(Path(path))

    def verify_task(self, dataset: Any, per_device_batch_size: int = 8) -> None:
        """Probes one batch and raises `IllegalTaskConfigurationError` /
        `TrackedModuleNotFoundError` on common Task mistakes (mean-reduced
        loss, non-scalar measurement, mis-shaped attention mask, unknown
        tracked-module names) before any expensive stage runs."""
        from kronfluence_tpu.utils.dataset import BatchLoader
        from kronfluence_tpu.utils.task_check import verify_task_configuration

        batch, _ = BatchLoader(dataset, per_device_batch_size).probe()
        verify_task_configuration(self.model, self.params, self.task, batch)

    def release_memory(self) -> None:
        """Frees cached device state (precondition states, derived values)
        held between score runs — the analogue of the reference's
        `State.release_memory` (utils/state.py:117-125). Jitted step caches
        are kept; they hold no large buffers."""
        from kronfluence_tpu.utils.jit_cache import clear_value_cache

        clear_value_cache(self.model)

    def get_module_summary(self) -> str:
        """Returns a summary of tracked modules (reference analyzer.py:222-242)."""
        specs = self._layer_specs()
        lines = ["==Tracked Modules=="]
        for name, spec in specs.items():
            lines.append(
                f"Module Name: `{name}`, kind: {spec.kind}, "
                f"activation_dim: {spec.activation_dim}, gradient_dim: {spec.gradient_dim}"
            )
        return "\n".join(lines)


def _flatten_params(params: Any) -> Dict[str, np.ndarray]:
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for key, value in tree.items():
                walk(value, f"{prefix}/{key}" if prefix else str(key))
        else:
            flat[prefix] = np.asarray(tree)

    walk(params, "")
    return flat
