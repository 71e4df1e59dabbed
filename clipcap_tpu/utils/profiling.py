"""Tracing / profiling helpers.

The reference has no profiling beyond ad-hoc time.time() deltas
(reference sampling.py:415,432-434). Here:

- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard/XProf trace of device execution;
- `annotate(name)`: TraceAnnotation for named regions inside a step;
- `StepTimer`: wall-clock step timing with hard device sync (this
  environment's relay makes block_until_ready unreliable, so the sync
  fetches a scalar), reporting p50/p90/mean.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def hard_sync(x) -> None:
    """Force completion of `x`'s computation with a scalar host fetch."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))


class StepTimer:
    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            hard_sync(result)
        self.times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def step(self, sync_on=None):
        self.start()
        holder = {}
        yield holder
        self.stop(holder.get("result", sync_on))

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
