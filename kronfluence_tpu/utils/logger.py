"""Logging + profiling (parity with kronfluence/utils/logger.py).

The Profiler produces the same percentage-table summary format the reference
publishes as its de-facto benchmark output (example READMEs). Timers call
`jax.block_until_ready` on demand via explicit `synchronize` hooks at stage
boundaries — inner steps stay async so the TPU pipeline is never stalled.
"""

import logging
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List, Optional, Tuple


def get_logger(name: str, level: Optional[int] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if level is not None:
        logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
        )
        logger.addHandler(handler)
    return logger


class PassThroughProfiler:
    """No-op profiler (default, reference: logger.py:157-167)."""

    @contextmanager
    def profile(self, action_name: str):
        yield

    def summary(self) -> str:
        return ""


class Profiler(PassThroughProfiler):
    """Named action timers with a percentage-table summary."""

    def __init__(self) -> None:
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._order: List[str] = []

    @contextmanager
    def profile(self, action_name: str):
        if action_name not in self._totals:
            self._order.append(action_name)
        start = time.monotonic()
        try:
            yield
        finally:
            self._totals[action_name] += time.monotonic() - start
            self._counts[action_name] += 1

    def rows(self) -> List[Tuple[str, float, int]]:
        return [(name, self._totals[name], self._counts[name]) for name in self._order]

    def summary(self) -> str:
        total = sum(self._totals.values())
        if total <= 0:
            return "Profiler Report: no recorded actions."
        lines = [
            "----------------------------------------------------------------------------------------------------",
            f"{'Action':<50}|  {'Mean duration (s)':<18}|  {'Num calls':<10}|  {'Total time (s)':<15}|  {'Percentage %':<13}",
            "----------------------------------------------------------------------------------------------------",
            f"{'Total':<50}|  {'-':<18}|  {'1':<10}|  {total:<15.5}|  {100.0:<13.5}",
            "----------------------------------------------------------------------------------------------------",
        ]
        for name, t, c in sorted(self.rows(), key=lambda r: -r[1]):
            lines.append(
                f"{name:<50}|  {t / max(c, 1):<18.5}|  {c:<10}|  {t:<15.5}|  {100.0 * t / total:<13.5}"
            )
        return "\n".join(lines)
