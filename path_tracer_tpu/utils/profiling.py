"""Profiling utilities: ray-throughput counters and device traces.

The reference's only instrumentation is BVH traversal-cost heatmaps
(SURVEY.md section 5); here throughput counters (Mrays/s) are
first-class, plus jax.profiler integration for device traces.

IMPORTANT runtime note: on this TPU runtime, Pallas-program execution is
deferred until the first device->host readback, and that first readback
permanently switches the process into synchronous execution. Timing is
therefore only meaningful when each measured region ends with a
readback; `RayThroughputTimer` does this for you.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


class RayThroughputTimer:
    """Times wavefront rounds and reports Mrays/s.

    Every wavefront round traces exactly one ray per lane (terminated
    paths respawn in place), so rays = lanes * rounds.
    """

    def __init__(self, lanes):
        self.lanes = lanes
        self.rounds = 0
        self.elapsed = 0.0

    @contextlib.contextmanager
    def measure(self, rounds, sync_array=None):
        t0 = time.time()
        yield
        if sync_array is not None:
            # Force execution of deferred work (see module docstring).
            float(jnp.sum(sync_array))
        self.elapsed += time.time() - t0
        self.rounds += rounds

    @property
    def mrays_per_second(self):
        if self.elapsed == 0:
            return 0.0
        return self.lanes * self.rounds / self.elapsed / 1e6


@contextlib.contextmanager
def device_trace(log_dir='/tmp/pt_trace'):
    """jax.profiler trace around a region (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
