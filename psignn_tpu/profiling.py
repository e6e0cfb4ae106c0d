"""Profiling and throughput accounting.

The reference's tracing is ad hoc wall-clock + cuda.synchronize
(SURVEY.md §5.1); the TPU equivalents here are ``jax.profiler`` traces and
explicit edges/s counters used by ``bench.py`` and the eval harnesses.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 3, warmup: int = 1):
    """Best-of wall-clock of a device computation, forcing completion via a
    host transfer (the reliable sync on the axon platform; analog of the
    reference's torch.cuda.synchronize timing, spec_geo.py:241-245)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return out, min(times)


class EdgeThroughput:
    """edges/s accounting for fixed-point message passing.

    Each update-function evaluation visits every (non-self-loop) edge once
    per direction; psignn's Function does 2 directions per layer
    (model.py:285-286), 3 in mixed mode."""

    def __init__(self, n_edges: int, directions: int = 2, n_layers: int = 1):
        self.edges_per_eval = n_edges * directions * n_layers

    def edges_per_s(self, n_evals: int, seconds: float) -> float:
        return self.edges_per_eval * n_evals / seconds

    def report(self, n_evals: int, seconds: float,
               baseline: Optional[float] = None) -> Dict[str, float]:
        eps = self.edges_per_s(n_evals, seconds)
        out = {"edges_per_s": eps, "wall_s": seconds, "n_evals": n_evals}
        if baseline:
            out["vs_baseline"] = eps / baseline
        return out
