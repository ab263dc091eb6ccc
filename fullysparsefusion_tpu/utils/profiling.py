"""Profiling / tracing utilities.

Replaces the reference's ``TorchTimer`` (core/utils/timer.py:4-41 — a
CUDA-synchronized section timer with periodic averaged prints) with a
device-synchronized JAX equivalent, plus helpers around ``jax.profiler``
for real traces (SURVEY.md §5 tracing plan).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class SectionTimer:
    """Section timer with block-until-ready sync and periodic averages.

    Usage::

        timer = SectionTimer(print_interval=20)
        with timer.section("segmentor", sync=out):
            out = seg_fn(x)
    """

    def __init__(self, print_interval: int = 20, enabled: bool = True):
        self.print_interval = print_interval
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        if self.counts[name] % self.print_interval == 0:
            avg = self.totals[name] / self.counts[name] * 1000
            print(f"[timer] {name}: avg {avg:.1f} ms over {self.counts[name]} calls")

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) * 1000 for k in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate ops for trace viewers (jax.named_scope passthrough)."""
    return jax.named_scope(name)
