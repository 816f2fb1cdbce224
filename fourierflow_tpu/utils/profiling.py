"""First-class profiling helpers.

The reference has no profiler integration at all (SURVEY.md §5 —
wall-clock timing only). Here: a ``jax.profiler`` trace context for
post-hoc analysis in TensorBoard/Perfetto, and a steps/sec meter whose
numbers feed the trainer logs (steps/sec/chip is the BASELINE.md
north-star speed metric).
"""

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """``with trace('/tmp/t'):`` — captures a device trace viewable with
    TensorBoard's profile plugin or ui.perfetto.dev."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s", log_dir)


class StepTimer:
    """Exponential-moving-average steps/sec meter.

    NOTE (axon relay): ``block_until_ready`` returns before device compute
    finishes on the relay backend, so call ``mark`` only after a real
    value transfer (e.g. after ``float(loss)``).
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last = None
        self.steps_per_sec = None

    def mark(self, n_steps: int = 1):
        now = time.perf_counter()
        if self._last is not None:
            rate = n_steps / (now - self._last)
            self.steps_per_sec = (
                rate
                if self.steps_per_sec is None
                else self.ema * self.steps_per_sec + (1 - self.ema) * rate
            )
        self._last = now
        return self.steps_per_sec
