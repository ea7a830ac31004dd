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


class MultiProcessAdapter(logging.LoggerAdapter):
    """Rank-gated logging (reference: utils/logger.py:22-54): by default only
    process 0 emits; pass `main_process_only=False` in `extra` to log from
    every process (messages are then prefixed with the process index)."""

    def __init__(self, logger: logging.Logger, main_process_only: bool = True) -> None:
        super().__init__(logger, {})
        self.main_process_only = main_process_only

    @staticmethod
    def _process_index() -> int:
        import jax

        try:
            return jax.process_index()
        except Exception:
            return 0

    def log(self, level, msg, *args, main_process_only: Optional[bool] = None, **kwargs):
        gate = self.main_process_only if main_process_only is None else main_process_only
        index = self._process_index()
        if gate and index != 0:
            return
        if not gate and index != 0:
            msg = f"[process {index}] {msg}"
        super().log(level, msg, *args, **kwargs)


def get_logger(
    name: str, level: Optional[int] = None, main_process_only: bool = True
) -> MultiProcessAdapter:
    logger = logging.getLogger(name)
    if level is not None:
        logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
        )
        logger.addHandler(handler)
    return MultiProcessAdapter(logger, main_process_only=main_process_only)


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
        self._depths: Dict[str, int] = {}
        self._depth = 0

    @contextmanager
    def profile(self, action_name: str):
        if action_name not in self._totals:
            self._order.append(action_name)
            # Stage drivers nest sub-phase regions inside the computer-level
            # stage region; remember each action's nesting depth so the
            # summary total only sums top-level regions (no double counting).
            self._depths[action_name] = self._depth
        self._depth += 1
        start = time.monotonic()
        try:
            yield
        finally:
            self._depth -= 1
            self._totals[action_name] += time.monotonic() - start
            self._counts[action_name] += 1

    def rows(self) -> List[Tuple[str, float, int]]:
        return [(name, self._totals[name], self._counts[name]) for name in self._order]

    def summary(self) -> str:
        total = sum(
            t for name, t in self._totals.items() if self._depths.get(name, 0) == 0
        )
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
            display = ("  " * self._depths.get(name, 0)) + name
            lines.append(
                f"{display:<50}|  {t / max(c, 1):<18.5}|  {c:<10}|  {t:<15.5}|  {100.0 * t / total:<13.5}"
            )
        return "\n".join(lines)


def get_time(synchronize: bool = True) -> float:
    """Cross-process MAX-synchronized wall clock (reference:
    utils/logger.py:292-312 `get_time`, which cuda-synchronizes then
    all_reduces MAX). Here: wait for local device work, then take the MAX of
    every process's clock so elapsed times agree across ranks."""
    import jax

    if synchronize:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    t = time.perf_counter()
    try:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            import numpy as np

            times = multihost_utils.process_allgather(np.asarray(t, np.float64))
            return float(np.max(times))
    except Exception:
        pass
    return t


class TraceProfiler(Profiler):
    """jax.profiler-backed variant (analogue of the reference's TorchProfiler,
    utils/logger.py:170-275): wall-clock tables plus an on-disk TensorBoard
    trace of device activity for the profiled region."""

    def __init__(self, trace_dir: str = "./profiler_output") -> None:
        super().__init__()
        self.trace_dir = trace_dir
        self._tracing = False

    @contextmanager
    def profile(self, action_name: str):
        import jax

        start_trace = not self._tracing
        if start_trace:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        try:
            # Nested regions cannot start their own trace (jax.profiler
            # permits one at a time), but a TraceAnnotation labels the span
            # inside the enclosing trace so stage sub-phases stay visible in
            # the TensorBoard timeline instead of silently merging.
            with jax.profiler.TraceAnnotation(action_name):
                with super().profile(action_name):
                    yield
        finally:
            if start_trace:
                jax.profiler.stop_trace()
                self._tracing = False
