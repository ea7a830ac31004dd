"""ScoreComputer: orchestration for pairwise / self influence scores.

Redesign of reference kronfluence/computer/score_computer.py:77-798:
skip-if-exists, score-argument persistence, flag-compatibility validation,
(data × module) partitioning with concat/sum aggregation, and query/train
index subsetting.
"""

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.computer.computer import Computer
from kronfluence_tpu.score.pairwise import compute_pairwise_scores_with_loaders
from kronfluence_tpu.score.self_scores import compute_self_scores_with_loaders
from kronfluence_tpu.utils.constants import (
    ALL_MODULE_NAME,
    SCORE_ARGUMENTS_NAME,
)
from kronfluence_tpu.utils.dataset import dataset_length, make_indices_partition
from kronfluence_tpu.utils.save import load_file, save_file


def pairwise_scores_save_path(output_dir: Path, partition=None) -> Path:
    if partition is not None:
        di, mi = partition
        return Path(output_dir) / (
            f"pairwise_scores_data_partition{di}_module_partition{mi}.safetensors"
        )
    return Path(output_dir) / "pairwise_scores.safetensors"


def self_scores_save_path(output_dir: Path, partition=None) -> Path:
    if partition is not None:
        di, mi = partition
        return Path(output_dir) / (
            f"self_scores_data_partition{di}_module_partition{mi}.safetensors"
        )
    return Path(output_dir) / "self_scores.safetensors"


class ScoreComputer(Computer):
    def _validate_pairwise_flags(self, score_args: ScoreArguments) -> ScoreArguments:
        """Returns a validated COPY; never mutates the caller's arguments
        (reference warns-and-adjusts on a per-call basis,
        score_computer.py:287-309)."""
        if score_args.compute_per_token_scores and (
            score_args.aggregate_train_gradients
            or score_args.aggregate_query_gradients
            or self.task.enable_post_process_per_sample_gradient
        ):
            self.logger.warning(
                "Per-token scores are incompatible with gradient aggregation / "
                "post-processing; falling back to per-sequence scores."
            )
            score_args = dataclasses.replace(score_args, compute_per_token_scores=False)
        if score_args.query_gradient_storage_dtype is not None and (
            score_args.aggregate_query_gradients
            or score_args.query_gradient_low_rank is not None
        ):
            self.logger.warning(
                "query_gradient_storage_dtype is ignored for aggregated or "
                "low-rank query gradients (those blocks are already small); "
                "proceeding without quantized storage."
            )
            score_args = dataclasses.replace(
                score_args, query_gradient_storage_dtype=None
            )
        return score_args

    def compute_pairwise_scores(
        self,
        scores_name: str,
        factors_name: str,
        query_dataset: Any,
        train_dataset: Any,
        per_device_query_batch_size: int,
        per_device_train_batch_size: Optional[int] = None,
        initial_per_device_train_batch_size_attempt: int = 4096,
        query_indices: Optional[Sequence[int]] = None,
        train_indices: Optional[Sequence[int]] = None,
        dataloader_kwargs=None,
        score_args: Optional[ScoreArguments] = None,
        target_data_partitions: Optional[Sequence[int]] = None,
        target_module_partitions: Optional[Sequence[int]] = None,
        overwrite_output_dir: bool = False,
    ) -> None:
        score_args = dataclasses.replace(score_args) if score_args else ScoreArguments()
        scores_dir = self.scores_output_dir(scores_name)
        scores_dir.mkdir(parents=True, exist_ok=True)
        if pairwise_scores_save_path(scores_dir).exists() and not overwrite_output_dir:
            self.logger.info(f"Found existing pairwise scores at {scores_dir}. Skipping.")
            return
        score_args = self._validate_pairwise_flags(score_args)
        self._save_arguments(SCORE_ARGUMENTS_NAME, score_args, scores_dir, overwrite_output_dir)
        self._save_dataset_metadata(
            "query", query_dataset, scores_dir, overwrite_output_dir, query_indices
        )
        self._save_dataset_metadata(
            "train", train_dataset, scores_dir, overwrite_output_dir, train_indices
        )

        factor_args = self.loaded_factor_args(factors_name)
        factors = self.load_all_factors(factors_name)

        query_loader = self._get_loader(
            query_dataset, per_device_query_batch_size, query_indices,
            dataloader_kwargs=dataloader_kwargs,
            stage="pairwise", score_args=score_args,
        )
        train_idx = (
            np.asarray(train_indices, dtype=np.int64)
            if train_indices is not None
            else np.arange(dataset_length(train_dataset))
        )

        def compute_partition(di, mi, group):
            train_loader = self._get_loader(
                train_dataset,
                per_device_train_batch_size,
                train_idx[slice(*data_ranges[di])],
                initial_per_device_train_batch_size_attempt,
                dataloader_kwargs=dataloader_kwargs,
                stage="pairwise", score_args=score_args,
            )
            with self.profiler.profile("Compute Pairwise Score"):
                return compute_pairwise_scores_with_loaders(
                    self.model, self.params, self.task, query_loader, train_loader,
                    factors, factor_args, score_args,
                    tracked_names=group if len(module_groups) > 1 else None,
                    mesh=self.mesh, profiler=self.profiler,
                )

        module_names = self.tracked_module_names(train_dataset)
        module_groups = self._partition_module_names(module_names, score_args.module_partitions)
        data_ranges = make_indices_partition(len(train_idx), score_args.data_partitions)

        aggregated = self._run_score_partitions(
            compute_partition, module_groups, data_ranges, score_args,
            target_data_partitions, target_module_partitions,
            scores_dir, pairwise_scores_save_path, concat_axis=1,
            overwrite_output_dir=overwrite_output_dir,
        )
        if aggregated is None:
            return  # target subset requested: per-partition artifacts only.
        with self.profiler.profile("Save Pairwise Score"):
            save_file(aggregated, pairwise_scores_save_path(scores_dir))
        self.logger.info(f"Saved pairwise scores at {scores_dir}.")
        self._save_profile_summary("pairwise_score")

    def _run_score_partitions(
        self,
        compute_partition,
        module_groups,
        data_ranges,
        score_args: ScoreArguments,
        target_data_partitions,
        target_module_partitions,
        scores_dir,
        save_path_fn,
        concat_axis: int,
        overwrite_output_dir: bool,
    ) -> Optional[Dict[str, np.ndarray]]:
        """(data x module) partition loop with preemption-safe resume.

        Mirrors reference score_computer.py:276-380: every completed partition
        is persisted and skipped on rerun, and `target_*_partitions` restricts
        a job to a subset (the split-work-across-hosts workflow) — in that
        case final aggregation is deferred to the full rerun.
        """
        partitioned = score_args.data_partitions > 1 or score_args.module_partitions > 1
        targeted = (
            target_data_partitions is not None or target_module_partitions is not None
        )
        data_targets = (
            list(target_data_partitions)
            if target_data_partitions is not None
            else list(range(score_args.data_partitions))
        )
        module_targets = (
            list(target_module_partitions)
            if target_module_partitions is not None
            else list(range(score_args.module_partitions))
        )

        results: Dict[tuple, Dict[str, np.ndarray]] = {}
        for di in data_targets:
            for mi in module_targets:
                partition = (di, mi)
                path = save_path_fn(scores_dir, partition) if partitioned else None
                if (
                    partitioned
                    and path.exists()
                    and not overwrite_output_dir
                ):
                    self.logger.info(
                        f"Found existing scores for partition {partition}. Skipping."
                    )
                    results[partition] = dict(load_file(path))
                    continue
                scores = compute_partition(di, mi, module_groups[mi])
                if partitioned:
                    save_file(scores, path)
                    self.logger.info(f"Saved scores for partition {partition}.")
                results[partition] = scores

        if targeted:
            return None
        partition_results = [
            [results[(di, mi)] for mi in range(score_args.module_partitions)]
            for di in range(score_args.data_partitions)
        ]
        return _aggregate_scores(partition_results, score_args, concat_axis=concat_axis)

    def compute_self_scores(
        self,
        scores_name: str,
        factors_name: str,
        train_dataset: Any,
        per_device_train_batch_size: Optional[int] = None,
        initial_per_device_train_batch_size_attempt: int = 4096,
        train_indices: Optional[Sequence[int]] = None,
        dataloader_kwargs=None,
        score_args: Optional[ScoreArguments] = None,
        target_data_partitions: Optional[Sequence[int]] = None,
        target_module_partitions: Optional[Sequence[int]] = None,
        overwrite_output_dir: bool = False,
    ) -> None:
        # Self-influence strips options that do not apply — on a COPY, never
        # the caller's object (reference: score_computer.py:617-639).
        score_args = dataclasses.replace(
            score_args or ScoreArguments(),
            query_gradient_accumulation_steps=1,
            query_gradient_low_rank=None,
            aggregate_query_gradients=False,
            aggregate_train_gradients=False,
            compute_per_token_scores=False,
            query_gradient_storage_dtype=None,  # no resident query block
        )

        scores_dir = self.scores_output_dir(scores_name)
        scores_dir.mkdir(parents=True, exist_ok=True)
        if self_scores_save_path(scores_dir).exists() and not overwrite_output_dir:
            self.logger.info(f"Found existing self scores at {scores_dir}. Skipping.")
            return
        self._save_arguments(SCORE_ARGUMENTS_NAME, score_args, scores_dir, overwrite_output_dir)
        self._save_dataset_metadata(
            "train", train_dataset, scores_dir, overwrite_output_dir, train_indices
        )

        factor_args = self.loaded_factor_args(factors_name)
        factors = self.load_all_factors(factors_name)
        train_idx = (
            np.asarray(train_indices, dtype=np.int64)
            if train_indices is not None
            else np.arange(dataset_length(train_dataset))
        )

        def compute_partition(di, mi, group):
            train_loader = self._get_loader(
                train_dataset,
                per_device_train_batch_size,
                train_idx[slice(*data_ranges[di])],
                initial_per_device_train_batch_size_attempt,
                dataloader_kwargs=dataloader_kwargs,
                stage="self", score_args=score_args,
            )
            with self.profiler.profile("Compute Self-Influence Score"):
                return compute_self_scores_with_loaders(
                    self.model, self.params, self.task, train_loader,
                    factors, factor_args, score_args,
                    tracked_names=group if len(module_groups) > 1 else None,
                    mesh=self.mesh, profiler=self.profiler,
                )

        module_names = self.tracked_module_names(train_dataset)
        module_groups = self._partition_module_names(module_names, score_args.module_partitions)
        data_ranges = make_indices_partition(len(train_idx), score_args.data_partitions)

        aggregated = self._run_score_partitions(
            compute_partition, module_groups, data_ranges, score_args,
            target_data_partitions, target_module_partitions,
            scores_dir, self_scores_save_path, concat_axis=0,
            overwrite_output_dir=overwrite_output_dir,
        )
        if aggregated is None:
            return
        with self.profiler.profile("Save Self-Influence Score"):
            save_file(aggregated, self_scores_save_path(scores_dir))
        self.logger.info(f"Saved self-influence scores at {scores_dir}.")
        self._save_profile_summary("self_score")

    def load_pairwise_scores(self, scores_name: str) -> Dict[str, np.ndarray]:
        return dict(load_file(pairwise_scores_save_path(self.scores_output_dir(scores_name))))

    def load_self_scores(self, scores_name: str) -> Dict[str, np.ndarray]:
        return dict(load_file(self_scores_save_path(self.scores_output_dir(scores_name))))


def _aggregate_scores(
    partition_results: List[List[Dict[str, np.ndarray]]],
    score_args: ScoreArguments,
    concat_axis: int,
) -> Dict[str, np.ndarray]:
    """Concatenates along the train/data axis; sums across module partitions
    unless per-module scores are kept (reference: score_computer.py:77-139)."""
    data_chunks: List[Dict[str, np.ndarray]] = []
    for row in partition_results:
        merged: Dict[str, np.ndarray] = {}
        for scores in row:
            for key, val in scores.items():
                if key in merged and key == ALL_MODULE_NAME:
                    merged[key] = merged[key] + val
                elif key in merged:
                    merged[key] = merged[key] + val
                else:
                    merged[key] = val
        data_chunks.append(merged)
    if len(data_chunks) == 1:
        return data_chunks[0]
    out: Dict[str, np.ndarray] = {}
    for key in data_chunks[0]:
        out[key] = np.concatenate([chunk[key] for chunk in data_chunks], axis=concat_axis)
    return out
