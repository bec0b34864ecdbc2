"""Profiling and debugging utilities — first-class versions of the
reference's vestigial hooks (SURVEY.md §5: commented `gpu_profile` lines in
`train_transformed_rays.py:22,551,600`, wall-clock prints, and the
commented `torch.autograd.set_detect_anomaly` at :44-45).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


def host_rss_gb(pid: Optional[int] = None) -> Optional[float]:
    """Resident-set size of `pid` (default: this process) in GiB via
    /proc — no psutil in the image. None if the process is gone or
    /proc is unavailable; callers that need a number coalesce to 0.0."""
    path = f"/proc/{pid}/status" if pid is not None else "/proc/self/status"
    try:
        with open(path) as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        return None
    return None


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug(nans: bool = True, infs: bool = False) -> None:
    """Debug-mode numerics: fail fast on NaN/Inf inside jitted code (the
    JAX equivalent of torch's detect_anomaly)."""
    import jax

    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)


class RateMeter:
    """Throughput meter with exponential smoothing: call `update(n)` per
    step with the number of items (rays) processed."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._rate: Optional[float] = None
        self._last: Optional[float] = None
        self.total = 0

    def update(self, n: int) -> float:
        now = time.perf_counter()
        self.total += n
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = n / dt
            self._rate = (
                inst
                if self._rate is None
                else self.smoothing * self._rate + (1 - self.smoothing) * inst
            )
        self._last = now
        return self._rate or 0.0

    @property
    def rate(self) -> float:
        return self._rate or 0.0
