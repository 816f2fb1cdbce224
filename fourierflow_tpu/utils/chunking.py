"""Shared dispatch-chunking helpers.

The axon relay kills any single XLA dispatch running longer than ~1
minute, so the trainer, the Kolmogorov generator, and the CN torus solver
all split long loops into bounded dispatches sized by a timed two-probe
calibration. The schedule math and the calibration rules live here so the
three call sites cannot drift (each once grew its own probe bug).

Calibration contract (see call sites): run one probe dispatch of
``probe`` iterations to pay the compile, then a SECOND dispatch of the
SAME size timed clean; the measured rate sizes subsequent chunks to
``target_s`` seconds. If the remaining work cannot fit a second
equal-size probe, skip calibration — the caller then schedules with
``target=probe`` (probe-size chunks are always safe) instead of trusting
a timing that would include a fresh compile for the odd-size dispatch.
"""

__all__ = ["bounded_schedule", "rate_to_chunk"]


def bounded_schedule(total: int, target: int):
    """Chunk sizes covering ``total`` with at most two distinct values,
    none exceeding ``target`` (sizes are as equal as possible)."""
    if total <= 0:
        return []
    target = max(1, target)
    n_chunks = -(-total // target)
    base = total // n_chunks
    extra = total - base * n_chunks
    return [base + 1] * extra + [base] * (n_chunks - extra)


def rate_to_chunk(rate, target_s: float, minimum: int = 2) -> int:
    """Chunk size targeting ``target_s`` seconds at ``rate`` iterations/s."""
    return max(minimum, int(target_s * rate))
