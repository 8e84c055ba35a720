"""Profiling and timing utilities.

TPU-native equivalent of the reference's PROFILING timers
(qpdo_tic/qpdo_toc, src/util.c:181-268): wall-clock phase timers with
device synchronization, plus a ``jax.profiler`` trace context for kernel-
level inspection (the Info struct keeps setup/solve/run_time, types.h:66-70).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict

import jax
import numpy as np


def sync(tree) -> None:
    """Force completion of all leaves (host transfer of one element per
    leaf; plain block_until_ready is unreliable on some platforms)."""
    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf).ravel()[:1]


@dataclass
class PhaseTimer:
    """Accumulating named phase timers (seconds)."""

    times: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if tree is not None:
                sync(tree)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.times.items(), key=lambda kv: -kv[1]))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
