"""MLP test/example models (flax), mirroring the reference's testable tasks
(tests/testable_tasks/regression.py): a plain MLP and a shared-parameter
variant whose middle layer is applied multiple times per forward."""

from typing import Sequence

import flax.linen as nn
import jax


class MLP(nn.Module):
    """Simple ReLU MLP for regression/classification tasks."""

    hidden_dims: Sequence[int] = (32, 32)
    out_dim: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, width in enumerate(self.hidden_dims):
            x = nn.Dense(width, use_bias=self.use_bias, name=f"layers_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, use_bias=self.use_bias, name="output")(x)


class RepeatedMLP(nn.Module):
    """MLP whose shared middle layer runs `num_repeats` times per forward —
    exercises shared-parameter per-sample-gradient accumulation."""

    hidden_dim: int = 32
    out_dim: int = 1
    num_repeats: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, name="input_layer")(x)
        x = nn.relu(x)
        shared = nn.Dense(self.hidden_dim, name="shared_layer")
        for _ in range(self.num_repeats):
            x = nn.relu(shared(x))
        return nn.Dense(self.out_dim, name="output")(x)
