"""Small CNN test/example models (flax, NHWC — the TPU-native conv layout).

Mirrors the reference's classification testable tasks
(tests/testable_tasks/classification.py): small convs incl. bias/no-bias and
grouped variants to exercise the conv2d Kronecker-factor math.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax


class SmallCNN(nn.Module):
    """Conv -> ReLU stack with a dense classifier head."""

    num_classes: int = 10
    channels: Sequence[int] = (8, 16)
    kernel: Tuple[int, int] = (3, 3)
    use_bias: bool = True
    padding: str = "SAME"
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, ch in enumerate(self.channels):
            x = nn.Conv(
                ch,
                kernel_size=self.kernel,
                strides=self.strides,
                padding=self.padding,
                use_bias=self.use_bias,
                feature_group_count=self.groups if i > 0 else 1,
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="head")(x)
