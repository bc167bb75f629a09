"""Tracing / profiling harness.

The reference's only performance surface is a wall-clock ms/step print
(reference: MSGM_higherDim.py:817-819) plus a dormant thop FLOP hook
(model/unet.py:252-273). TPU-native equivalents:

- `trace(dir)` — context manager around `jax.profiler` producing an XPlane
  trace viewable in TensorBoard / Perfetto.
- `Timer` — block_until_ready-disciplined step timer (honest device timing;
  async dispatch otherwise under-reports).
- `benchmark(fn, *args)` — best-of-N wall time with compile excluded.
- `attention_flops` / `unet_param_count` — static cost accounting replacing
  the thop counter.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np


@contextmanager
def trace(log_dir):
    """Capture a device trace: `with trace("/tmp/trace"): step()`."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """ms/step timing with block_until_ready discipline."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def step(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.steps += 1

    def ms_per_step(self):
        if self.steps == 0:
            return float("nan")
        return (time.perf_counter() - self.t0) * 1000.0 / self.steps

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0


def benchmark(fn, *args, repeats=5, inner=1):
    """Best-of-N seconds per call; the first (compiling) call is excluded."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def attention_flops(batch, spatial, channels):
    """Matmul FLOPs of one attention block: two (T², C) contractions
    (reference thop counter, model/unet.py:252-273 counts MACs; this is
    2·MACs = FLOPs)."""
    t = int(np.prod(spatial))
    return 2 * 2 * batch * t * t * channels


def param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
