"""Artifact IO for factors and scores.

Generalizes the per-stage save/load/exist path helpers of the reference
(factor/covariance.py:35-150, factor/eigen.py:46-130, score/pairwise.py:38-100)
— identical file naming, one safetensors file per factor name mapping
module-name -> tensor, with `_data_partition{i}_module_partition{j}` suffixes
when partitioned.
"""

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from kronfluence_tpu.utils.constants import (
    COVARIANCE_FACTOR_NAMES,
    EIGENDECOMPOSITION_FACTOR_NAMES,
    LAMBDA_FACTOR_NAMES,
    PARTITION_TYPE,
)
from kronfluence_tpu.utils.save import load_file, save_file

FactorDict = Dict[str, Dict[str, np.ndarray]]  # factor_name -> module -> tensor


def factor_path(
    output_dir: Path, factor_name: str, partition: Optional[PARTITION_TYPE] = None
) -> Path:
    if partition is not None:
        data_partition, module_partition = partition
        return Path(output_dir) / (
            f"{factor_name}_data_partition{data_partition}"
            f"_module_partition{module_partition}.safetensors"
        )
    return Path(output_dir) / f"{factor_name}.safetensors"


def save_factors(
    output_dir: Path,
    factors: FactorDict,
    factor_names: List[str],
    partition: Optional[PARTITION_TYPE] = None,
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    assert set(factors.keys()) == set(factor_names), (
        sorted(factors),
        sorted(factor_names),
    )
    for factor_name, tensors in factors.items():
        save_file(tensors, factor_path(output_dir, factor_name, partition), metadata)


def load_factors(
    output_dir: Path,
    factor_names: List[str],
    partition: Optional[PARTITION_TYPE] = None,
) -> FactorDict:
    return {
        name: load_file(factor_path(output_dir, name, partition))
        for name in factor_names
    }


def factors_exist(
    output_dir: Path,
    factor_names: List[str],
    partition: Optional[PARTITION_TYPE] = None,
) -> bool:
    return all(
        factor_path(output_dir, name, partition).exists() for name in factor_names
    )


# Named helpers mirroring the reference per-stage functions.
def save_covariance_matrices(output_dir, factors, partition=None, metadata=None):
    save_factors(output_dir, factors, COVARIANCE_FACTOR_NAMES, partition, metadata)


def load_covariance_matrices(output_dir, partition=None):
    return load_factors(output_dir, COVARIANCE_FACTOR_NAMES, partition)


def covariance_matrices_exist(output_dir, partition=None):
    return factors_exist(output_dir, COVARIANCE_FACTOR_NAMES, partition)


def save_eigendecomposition(output_dir, factors, metadata=None):
    save_factors(output_dir, factors, EIGENDECOMPOSITION_FACTOR_NAMES, None, metadata)


def load_eigendecomposition(output_dir):
    return load_factors(output_dir, EIGENDECOMPOSITION_FACTOR_NAMES)


def eigendecomposition_exist(output_dir):
    return factors_exist(output_dir, EIGENDECOMPOSITION_FACTOR_NAMES)


def save_lambda_matrices(output_dir, factors, partition=None, metadata=None):
    save_factors(output_dir, factors, LAMBDA_FACTOR_NAMES, partition, metadata)


def load_lambda_matrices(output_dir, partition=None):
    return load_factors(output_dir, LAMBDA_FACTOR_NAMES, partition)


def lambda_matrices_exist(output_dir, partition=None):
    return factors_exist(output_dir, LAMBDA_FACTOR_NAMES, partition)
