"""Tracing / profiling (SURVEY §5: the reference uses ad-hoc
time.perf_counter prints and CUDA max-mem in MetricLogger).

TPU-native replacement:
- ``stage(name)``: context manager combining a wall-clock timer with a
  ``jax.profiler.TraceAnnotation`` so stages show up in TensorBoard traces,
- ``Tracer``: structured per-stage accumulation with summary export,
- ``profile_to(dir)``: capture a full device trace around a code region,
- ``device_memory_stats()``: live HBM usage (the CUDA max-mem analogue).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class Tracer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / self.counts[name], 4),
            }
            for name in self.totals
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict:
    """Live per-device memory stats where the backend reports them."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    return dict(stats()) if callable(stats) else {}
