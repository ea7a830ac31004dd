"""Task abstraction: the user contract for loss / measurement computation.

Mirrors the reference Task (kronfluence/task.py:19-116) with JAX-functional
signatures: the model handle is a pure callable bound to parameters, losses
must be *summed* (not averaged) over the batch, and sampled-label (true
Fisher) losses take an explicit PRNG key instead of relying on global RNG.
"""

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Union

import jax


class Task(ABC):
    """Abstract base class for task definitions.

    Attributes:
        enable_post_process_per_sample_gradient (bool):
            Flag to enable post-processing of per-sample gradients.
    """

    enable_post_process_per_sample_gradient: bool = False

    @abstractmethod
    def compute_train_loss(
        self,
        batch: Any,
        model: Any,
        sample: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Computes the *summed* training loss for a batch.

        Args:
            batch: A batch of data (pytree of arrays).
            model: A bound model handle; call it like the forward function,
                e.g. `logits = model(batch["x"])`.
            sample: If True, draw labels from the model's output distribution
                (true Fisher). Use `jax.lax.stop_gradient` on the logits used
                for sampling, and `rng` as the PRNG key.
            rng: PRNG key, provided when `sample=True`.

        Returns:
            Scalar summed loss.
        """
        raise NotImplementedError

    @abstractmethod
    def compute_measurement(self, batch: Any, model: Any) -> jax.Array:
        """Computes the scalar measurable quantity f(θ) for a batch (summed)."""
        raise NotImplementedError

    def get_influence_tracked_modules(self) -> Optional[List[str]]:
        """Returns module names to track, or None to track all supported."""
        return None

    def get_attention_mask(self, batch: Any) -> Optional[Union[Dict[str, jax.Array], Any]]:
        """Returns a binary (batch, seq) mask, a dict module-name -> mask, or None."""
        return None

    def post_process_per_sample_gradient(self, module_name: str, gradient: jax.Array) -> jax.Array:
        """Post-processes a per-sample gradient of shape (batch, out_dim, in_dim[+1])."""
        del module_name
        return gradient
