"""FactorComputer: per-stage orchestration for covariance / eigh / lambda.

Redesign of reference kronfluence/computer/factor_computer.py:57-732:
skip-if-exists idempotency per (data-partition × module-partition), argument
and dataset-metadata persistence, partition aggregation, and factor reuse via
`load_from_factors_name`.
"""

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from kronfluence_tpu.arguments import FactorArguments
from kronfluence_tpu.computer.computer import Computer
from kronfluence_tpu.factor import io as factor_io
from kronfluence_tpu.factor.config import get_factor_config
from kronfluence_tpu.factor.covariance import fit_covariance_matrices_with_loader
from kronfluence_tpu.factor.eigen import (
    fit_lambda_matrices_with_loader,
    perform_eigendecomposition as _perform_eigendecomposition,
)
from kronfluence_tpu.utils.constants import (
    COVARIANCE_FACTOR_NAMES,
    EIGENDECOMPOSITION_FACTOR_NAMES,
    FACTOR_ARGUMENTS_NAME,
    LAMBDA_FACTOR_NAMES,
    NUM_ACTIVATION_COVARIANCE_PROCESSED,
    NUM_GRADIENT_COVARIANCE_PROCESSED,
    NUM_LAMBDA_PROCESSED,
)
from kronfluence_tpu.utils.dataset import dataset_length, make_indices_partition
from kronfluence_tpu.utils.exceptions import FactorsNotFoundError


def _aggregate_sum(
    per_partition: List[Dict[str, Dict[str, np.ndarray]]],
    count_names: Sequence[str],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Sums factor dicts across partitions (reference: factor_computer.py:57-108)."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for factors in per_partition:
        for factor_name, modules in factors.items():
            dest = out.setdefault(factor_name, {})
            for module_name, tensor in modules.items():
                if module_name in dest:
                    if factor_name in count_names:
                        dest[module_name] = dest[module_name] + tensor
                    else:
                        dest[module_name] = (
                            dest[module_name].astype(np.float64) + tensor.astype(np.float64)
                        ).astype(tensor.dtype)
                else:
                    dest[module_name] = tensor
    return out


class FactorComputer(Computer):
    def fit_covariance_matrices(
        self,
        factors_name: str,
        dataset: Any,
        per_device_batch_size: Optional[int] = None,
        initial_per_device_batch_size_attempt: int = 4096,
        dataloader_kwargs=None,
        factor_args: Optional[FactorArguments] = None,
        target_data_partitions: Optional[Sequence[int]] = None,
        target_module_partitions: Optional[Sequence[int]] = None,
        overwrite_output_dir: bool = False,
    ) -> None:
        factor_args = factor_args or FactorArguments()
        factors_dir = self.factors_output_dir(factors_name)
        factors_dir.mkdir(parents=True, exist_ok=True)
        if factor_io.covariance_matrices_exist(factors_dir) and not overwrite_output_dir:
            self.logger.info(f"Found existing covariance matrices at {factors_dir}. Skipping.")
            return
        self._save_arguments(FACTOR_ARGUMENTS_NAME, factor_args, factors_dir, overwrite_output_dir)

        total = dataset_length(dataset)
        max_examples = factor_args.covariance_max_examples
        num_examples = min(total, max_examples) if max_examples else total
        indices = np.arange(num_examples)
        self._save_dataset_metadata(
            "covariance", dataset, factors_dir, overwrite_output_dir,
            indices if num_examples < total else None,
        )

        self._run_partitioned_fit(
            stage="covariance",
            factor_args=factor_args,
            fit_fn=lambda loader, names: fit_covariance_matrices_with_loader(
                self.model, self.params, self.task, loader, factor_args,
                tracked_names=names, mesh=self.mesh, profiler=self.profiler,
            ),
            dataset=dataset,
            indices=indices,
            per_device_batch_size=per_device_batch_size,
            initial_attempt=initial_per_device_batch_size_attempt,
            dataloader_kwargs=dataloader_kwargs,
            data_partitions=factor_args.covariance_data_partitions,
            module_partitions=factor_args.covariance_module_partitions,
            target_data_partitions=target_data_partitions,
            target_module_partitions=target_module_partitions,
            factors_dir=factors_dir,
            factor_names=COVARIANCE_FACTOR_NAMES,
            count_names=(NUM_ACTIVATION_COVARIANCE_PROCESSED, NUM_GRADIENT_COVARIANCE_PROCESSED),
            exist_fn=factor_io.covariance_matrices_exist,
            save_fn=factor_io.save_covariance_matrices,
            load_fn=factor_io.load_covariance_matrices,
            overwrite_output_dir=overwrite_output_dir,
        )

    def perform_eigendecomposition(
        self,
        factors_name: str,
        factor_args: Optional[FactorArguments] = None,
        overwrite_output_dir: bool = False,
        load_from_factors_name: Optional[str] = None,
        return_in_memory: bool = False,
        async_save: bool = False,
    ):
        """Eigendecomposes the saved covariance factors.

        `return_in_memory=True` returns the eigen factors (device arrays on
        the fp32 device path) instead of None — on a skip it loads the saved
        artifacts so the caller always gets usable factors. `async_save=True`
        writes the safetensors artifacts on a background thread: the host
        fetch + disk write then overlap whatever the caller dispatches next
        (fit_all_factors overlaps them with the Lambda stage's batch loop;
        the device DMA for the fetch runs concurrently with compute). Callers
        must invoke `wait_for_async_saves()` before relying on the artifacts
        being on disk; fit_all_factors does.
        """
        factor_args = factor_args or self.loaded_factor_args(factors_name)
        config = get_factor_config(factor_args.strategy)
        factors_dir = self.factors_output_dir(factors_name)
        factors_dir.mkdir(parents=True, exist_ok=True)
        if not config.requires_eigendecomposition:
            self.logger.info(
                f"Strategy {factor_args.strategy!r} does not require eigendecomposition."
            )
            return None
        if factor_io.eigendecomposition_exist(factors_dir) and not overwrite_output_dir:
            self.logger.info(f"Found existing eigendecomposition at {factors_dir}. Skipping.")
            return (
                factor_io.load_eigendecomposition(factors_dir) if return_in_memory else None
            )
        source_dir = (
            self.factors_output_dir(load_from_factors_name)
            if load_from_factors_name
            else factors_dir
        )
        if not factor_io.covariance_matrices_exist(source_dir):
            raise FactorsNotFoundError(f"Covariance matrices not found in {source_dir}.")
        covariance = factor_io.load_covariance_matrices(source_dir)
        # Per-matrix crash checkpoints for Llama-scale (>= LARGE_EIGH_DIM)
        # factors: solves are ~10+ min each, and a crash late in the stage
        # must not forfeit the completed ones. Cleared after the aggregate
        # artifact is on disk.
        scratch_dir = factors_dir / "eigendecomposition_scratch"
        with self.profiler.profile("Perform Eigendecomposition"):
            eigen = _perform_eigendecomposition(
                covariance, factor_args, self.profiler, scratch_dir=scratch_dir
            )

        def _save() -> None:
            factor_io.save_eigendecomposition(factors_dir, eigen)
            if scratch_dir.exists():
                import shutil

                shutil.rmtree(scratch_dir, ignore_errors=True)
            self.logger.info(f"Saved eigendecomposition results at {factors_dir}.")

        if async_save:
            import threading

            box = {}

            def _run():
                try:
                    _save()
                except BaseException as exc:  # noqa: BLE001 — re-raised at join
                    box["exc"] = exc

            thread = threading.Thread(target=_run, daemon=True, name="kf-eigen-save")
            thread.start()
            self._pending_saves.append((thread, box))
        else:
            _save()
        self._save_profile_summary("eigendecomposition")
        return eigen if return_in_memory else None

    def wait_for_async_saves(self) -> None:
        """Joins background artifact writes started with `async_save=True`,
        re-raising the first failure (a silently missing artifact would break
        the skip-if-exists resume contract)."""
        pending, self._pending_saves = self._pending_saves, []
        for thread, box in pending:
            thread.join()
            if "exc" in box:
                raise box["exc"]

    def fit_lambda_matrices(
        self,
        factors_name: str,
        dataset: Any,
        per_device_batch_size: Optional[int] = None,
        initial_per_device_batch_size_attempt: int = 4096,
        dataloader_kwargs=None,
        factor_args: Optional[FactorArguments] = None,
        target_data_partitions: Optional[Sequence[int]] = None,
        target_module_partitions: Optional[Sequence[int]] = None,
        overwrite_output_dir: bool = False,
        load_from_factors_name: Optional[str] = None,
        eigen_factors=None,
    ) -> None:
        """`eigen_factors`: in-memory eigendecomposition results (as returned
        by `perform_eigendecomposition(return_in_memory=True)`). When given,
        the disk round-trip is skipped — on the fp32 device path the factors
        are device arrays whose solves may still be in flight, so the Lambda
        stage's dispatches queue directly behind the eigensolver's
        (fit_all_factors uses this to take eigendecomposition off the
        critical path)."""
        factor_args = factor_args or self.loaded_factor_args(factors_name)
        config = get_factor_config(factor_args.strategy)
        factors_dir = self.factors_output_dir(factors_name)
        factors_dir.mkdir(parents=True, exist_ok=True)
        if not config.requires_lambda_matrices:
            self.logger.info(
                f"Strategy {factor_args.strategy!r} does not require Lambda matrices."
            )
            return
        if factor_io.lambda_matrices_exist(factors_dir) and not overwrite_output_dir:
            self.logger.info(f"Found existing Lambda matrices at {factors_dir}. Skipping.")
            return
        self._save_arguments(FACTOR_ARGUMENTS_NAME, factor_args, factors_dir, overwrite_output_dir)

        if eigen_factors is None and config.requires_eigendecomposition_for_lambda:
            source_dir = (
                self.factors_output_dir(load_from_factors_name)
                if load_from_factors_name
                else factors_dir
            )
            if not factor_io.eigendecomposition_exist(source_dir):
                raise FactorsNotFoundError(
                    f"Eigendecomposition results not found in {source_dir}."
                )
            eigen_factors = factor_io.load_eigendecomposition(source_dir)
        elif not config.requires_eigendecomposition_for_lambda:
            eigen_factors = None

        total = dataset_length(dataset)
        max_examples = factor_args.lambda_max_examples
        num_examples = min(total, max_examples) if max_examples else total
        indices = np.arange(num_examples)
        self._save_dataset_metadata(
            "lambda", dataset, factors_dir, overwrite_output_dir,
            indices if num_examples < total else None,
        )

        self._run_partitioned_fit(
            stage="lambda",
            factor_args=factor_args,
            fit_fn=lambda loader, names: fit_lambda_matrices_with_loader(
                self.model, self.params, self.task, loader, factor_args,
                eigen_factors=eigen_factors, tracked_names=names, mesh=self.mesh,
                profiler=self.profiler,
            ),
            dataset=dataset,
            indices=indices,
            per_device_batch_size=per_device_batch_size,
            initial_attempt=initial_per_device_batch_size_attempt,
            dataloader_kwargs=dataloader_kwargs,
            data_partitions=factor_args.lambda_data_partitions,
            module_partitions=factor_args.lambda_module_partitions,
            target_data_partitions=target_data_partitions,
            target_module_partitions=target_module_partitions,
            factors_dir=factors_dir,
            factor_names=LAMBDA_FACTOR_NAMES,
            count_names=(NUM_LAMBDA_PROCESSED,),
            exist_fn=factor_io.lambda_matrices_exist,
            save_fn=factor_io.save_lambda_matrices,
            load_fn=factor_io.load_lambda_matrices,
            overwrite_output_dir=overwrite_output_dir,
        )

    # -- Shared partitioned-fit loop. --
    def _run_partitioned_fit(
        self,
        stage: str,
        fit_fn,
        dataset,
        factor_args,
        indices: np.ndarray,
        per_device_batch_size,
        initial_attempt: int,
        dataloader_kwargs,
        data_partitions: int,
        module_partitions: int,
        target_data_partitions,
        target_module_partitions,
        factors_dir,
        factor_names,
        count_names,
        exist_fn,
        save_fn,
        load_fn,
        overwrite_output_dir: bool,
    ) -> None:
        no_partition = data_partitions == 1 and module_partitions == 1
        module_names = self.tracked_module_names(dataset)
        module_groups = self._partition_module_names(module_names, module_partitions)
        data_ranges = make_indices_partition(len(indices), data_partitions)

        if no_partition:
            loader = self._get_loader(
                dataset, per_device_batch_size, indices, initial_attempt,
                dataloader_kwargs=dataloader_kwargs,
                stage=stage, factor_args=factor_args,
            )
            with self.profiler.profile(f"Fit {stage.capitalize()}"):
                factors = fit_fn(loader, None if module_partitions == 1 else module_names)
            with self.profiler.profile(f"Save {stage.capitalize()}"):
                save_fn(factors_dir, factors)
            self.logger.info(f"Saved {stage} factors at {factors_dir}.")
            self._save_profile_summary(stage)
            return

        data_targets = (
            list(target_data_partitions) if target_data_partitions is not None
            else list(range(data_partitions))
        )
        module_targets = (
            list(target_module_partitions) if target_module_partitions is not None
            else list(range(module_partitions))
        )
        for di in data_targets:
            start, end = data_ranges[di]
            for mi in module_targets:
                partition = (di, mi)
                if exist_fn(factors_dir, partition) and not overwrite_output_dir:
                    self.logger.info(f"Found existing {stage} factors for partition {partition}. Skipping.")
                    continue
                loader = self._get_loader(
                    dataset, per_device_batch_size, indices[start:end], initial_attempt,
                    dataloader_kwargs=dataloader_kwargs,
                    stage=stage, factor_args=factor_args,
                )
                with self.profiler.profile(f"Fit {stage.capitalize()}"):
                    factors = fit_fn(loader, module_groups[mi])
                save_fn(factors_dir, factors, partition)
                self.logger.info(f"Saved {stage} factors for partition {partition}.")

        # Aggregate all partitions into the unpartitioned artifact.
        if target_data_partitions is None and target_module_partitions is None:
            per_partition = [
                load_fn(factors_dir, (di, mi))
                for di in range(data_partitions)
                for mi in range(module_partitions)
            ]
            aggregated = _aggregate_sum(per_partition, count_names)
            save_fn(factors_dir, aggregated)
            self.logger.info(f"Saved aggregated {stage} factors at {factors_dir}.")
        self._save_profile_summary(stage)

    # -- Loaders for user access (reference: computer factor load helpers). --
    def load_covariance_matrices(self, factors_name: str):
        return factor_io.load_covariance_matrices(self.factors_output_dir(factors_name))

    def load_eigendecomposition(self, factors_name: str):
        return factor_io.load_eigendecomposition(self.factors_output_dir(factors_name))

    def load_lambda_matrices(self, factors_name: str):
        return factor_io.load_lambda_matrices(self.factors_output_dir(factors_name))
