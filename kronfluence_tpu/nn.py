"""Tagged functional layers (public alias for capture.functional)."""

from kronfluence_tpu.capture.functional import (
    checkpoint_block,
    conv2d,
    linear,
    scan_layers,
)

__all__ = ["linear", "conv2d", "scan_layers", "checkpoint_block"]
