"""Per-stage timing + colored logging.

Structured replacement for the reference's ad-hoc chrono spans + ROS_INFO
color helper (`fast_lio_sam.cpp:44-55,539-545`): named stages accumulate
wall-time statistics and print a summary table; `jax.profiler` traces can
be captured around any stage for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

_COLORS = {"red": 31, "green": 32, "yellow": 33, "blue": 34, "magenta": 35}


def colorize(text: str, color: str = "green") -> str:
    return f"\033[{_COLORS.get(color, 32)}m{text}\033[0m"


class StageTimer:
    """Accumulates wall-clock per named stage.

    >>> timer = StageTimer()
    >>> with timer("odometry"):
    ...     step()
    >>> print(timer.summary())
    """

    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[stage].append(time.perf_counter() - t0)

    def stats(self):
        out = {}
        for stage, xs in self.samples.items():
            a = np.asarray(xs) * 1000.0
            out[stage] = {
                "count": len(a),
                "mean_ms": float(a.mean()),
                "p50_ms": float(np.percentile(a, 50)),
                "p95_ms": float(np.percentile(a, 95)),
                "total_s": float(a.sum() / 1000.0),
            }
        return out

    def summary(self) -> str:
        rows = [f"{'stage':<24}{'count':>7}{'mean ms':>10}{'p95 ms':>10}{'total s':>10}"]
        for stage, s in sorted(self.stats().items()):
            rows.append(
                f"{stage:<24}{s['count']:>7}{s['mean_ms']:>10.2f}"
                f"{s['p95_ms']:>10.2f}{s['total_s']:>10.2f}"
            )
        return "\n".join(rows)


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with
    tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
