from kronfluence_tpu.capture.context import CaptureContext, activate, current_context
from kronfluence_tpu.capture.engine import CaptureResult, LayerCapture, capture, discover_specs
from kronfluence_tpu.capture.specs import LayerSpec

__all__ = [
    "CaptureContext",
    "CaptureResult",
    "LayerCapture",
    "LayerSpec",
    "activate",
    "capture",
    "current_context",
    "discover_specs",
]
