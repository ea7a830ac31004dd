"""Tagged functional layers (public alias for capture.functional)."""

from kronfluence_tpu.capture.functional import conv2d, linear

__all__ = ["linear", "conv2d"]
