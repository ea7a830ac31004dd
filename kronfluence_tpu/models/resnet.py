"""ResNet family (flax, NHWC) for the vision workloads.

ResNet-9 mirrors the reference's CIFAR example model (examples/cifar) and the
configurable depths cover the ImageNet ResNet-50 workload (examples/imagenet).
BatchNorm runs in inference mode during analysis (running statistics), as the
reference does by calling `model.eval()` inside `prepare_model`
(reference analyzer.py:37)."""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    channels: int
    pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class Residual(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBlock(self.channels, dtype=self.dtype, name="block_0")(x, train)
        y = ConvBlock(self.channels, dtype=self.dtype, name="block_1")(y, train)
        return x + y


class ResNet9(nn.Module):
    """CIFAR-scale ResNet-9 (reference examples/cifar model analogue)."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(64, dtype=self.dtype, name="stem")(x, train)
        x = ConvBlock(128, pool=True, dtype=self.dtype, name="layer1")(x, train)
        x = Residual(128, dtype=self.dtype, name="res1")(x, train)
        x = ConvBlock(256, pool=True, dtype=self.dtype, name="layer2")(x, train)
        x = ConvBlock(512, pool=True, dtype=self.dtype, name="layer3")(x, train)
        x = Residual(512, dtype=self.dtype, name="res2")(x, train)
        x = jnp.max(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


class BottleneckBlock(nn.Module):
    channels: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), self.strides, padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels * 4, (1, 1), self.strides, use_bias=False,
                               dtype=self.dtype, name="proj")(x)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="proj_bn")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """Bottleneck ResNet; stage_sizes (3,4,6,3) == ResNet-50."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, size in enumerate(self.stage_sizes):
            for block in range(size):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                x = BottleneckBlock(64 * 2**stage, strides, dtype=self.dtype,
                                    name=f"stage{stage}_block{block}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def resnet50(num_classes: int = 1000, dtype: Any = jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes, dtype=dtype)
