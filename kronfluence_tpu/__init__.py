"""kronfluence_tpu: a TPU-native (JAX/XLA/Pallas) influence-function framework.

Re-implements the capabilities of the reference PyTorch library "kronfluence"
(EK-FAC influence functions; see SURVEY.md) with a TPU-first architecture:
functional per-layer capture via one vjp, MXU-friendly factor/score
contractions, and SPMD scaling over a jax.sharding.Mesh.
"""

from kronfluence_tpu import nn, utils
from kronfluence_tpu.analyzer import Analyzer
from kronfluence_tpu.arguments import FactorArguments, ScoreArguments
from kronfluence_tpu.prepare import prepare_model
from kronfluence_tpu.task import Task
from kronfluence_tpu.version import __version__

__all__ = [
    "Analyzer",
    "prepare_model",
    "FactorArguments",
    "ScoreArguments",
    "Task",
    "nn",
    "utils",
    "__version__",
]
