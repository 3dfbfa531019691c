"""Tracing and throughput accounting.

The reference's only instrumentation is ad-hoc wall-clock prints around the
two L-BFGS stages (reference: optimizer.py:384-390, 413-419).  Here:
`jax.profiler` trace capture for TensorBoard/XProf, wall-clock span timers,
and a windows/sec meter (the benchmark's headline metric).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard or
    xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class SpanTimer:
    """Named wall-clock spans with block-until-ready semantics for honest
    device timing."""
    spans: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                import jax
                jax.block_until_ready(sync_value)
            self.spans.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> dict:
        import numpy as np
        return {k: {"mean_s": float(np.mean(v)), "total_s": float(np.sum(v)),
                    "count": len(v)} for k, v in self.spans.items()}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=1)


@dataclass
class ThroughputMeter:
    """windows/sec (or any unit/sec) accounting."""
    unit: str = "windows"
    total_units: float = 0.0
    total_seconds: float = 0.0

    @contextlib.contextmanager
    def measure(self, units: float, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                import jax
                jax.block_until_ready(sync_value)
            self.total_seconds += time.perf_counter() - t0
            self.total_units += units

    @property
    def rate(self) -> float:
        return self.total_units / self.total_seconds \
            if self.total_seconds else 0.0

    def report(self) -> str:
        return f"{self.rate:.2f} {self.unit}/s " \
               f"({self.total_units:.0f} {self.unit} in " \
               f"{self.total_seconds:.2f}s)"
