"""Persistence helpers: safetensors + JSON (parity with kronfluence/utils/save.py).

Artifacts are numpy tensors in `.safetensors` files whose names and key layout
match the reference exactly, so factor/score directories are interchangeable.
"""

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from safetensors.numpy import load_file as _st_load
from safetensors.numpy import save_file as _st_save


def save_file(tensors: Dict[str, np.ndarray], filename: Path, metadata: Optional[Dict[str, str]] = None) -> None:
    filename = Path(filename)
    filename.parent.mkdir(parents=True, exist_ok=True)
    from kronfluence_tpu.utils.platform import fetch_tree

    # Device arrays are bulk-fetched (one transfer, not one per leaf).
    tensors = fetch_tree(tensors)
    # bfloat16 round-trips natively through safetensors via ml_dtypes.
    arrays = {}
    for k, v in tensors.items():
        arr = np.asarray(v)
        if np.issubdtype(arr.dtype, np.integer):
            # Counts persist as int64 singletons, matching reference artifacts.
            arr = arr.reshape((-1,)).astype(np.int64)
        arrays[k] = np.ascontiguousarray(arr)
    _st_save(arrays, str(filename), metadata=metadata)


def load_file(filename: Path) -> Dict[str, np.ndarray]:
    if not Path(filename).exists():
        raise FileNotFoundError(f"File does not exist at {filename}.")
    return _st_load(str(filename))


def save_json(obj: Any, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=4, sort_keys=True)


def load_json(path: Path) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def verify_models_equivalence(state_dict1: Dict[str, Any], state_dict2: Dict[str, Any]) -> bool:
    """allclose comparison of two flat parameter dicts (reference: save.py:67-101)."""
    if len(state_dict1) != len(state_dict2):
        return False
    if state_dict1.keys() != state_dict2.keys():
        return False
    for name in state_dict1:
        a = np.asarray(state_dict1[name], dtype=np.float32)
        b = np.asarray(state_dict2[name], dtype=np.float32)
        if a.shape != b.shape or not np.allclose(a, b, rtol=1.3e-6, atol=1e-5):
            return False
    return True
