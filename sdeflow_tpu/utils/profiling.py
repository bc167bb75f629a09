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


def device_seconds(step, short=2, long=None, repeats=3, target=0.5):
    """Honest seconds-per-step through a remote/async backend.

    `step(i)` (i a traced int32 — fold it into keys/inputs so iterations
    can't be hoisted as loop-invariant) must return a small scalar. The
    whole chain runs as ONE jitted dynamic-bound fori_loop, so host/link
    latency never lands between iterations; syncing is a scalar host
    transfer; the reported time is the slope between two loop lengths, so
    the constant dispatch+transfer cost cancels. Needed because the remote
    (axon) runtime does not honor block_until_ready — Timer/benchmark there
    measure dispatch pipelining, not device time.

    With long=None the chain length is auto-calibrated so the measured
    slope window spans ~`target` seconds of device time (link jitter is
    tens of ms; short fixed windows can read slope <= 0 on fast ops).
    """
    import jax.numpy as jnp

    @jax.jit
    def chain(n):
        return jax.lax.fori_loop(
            0, n, lambda i, acc: acc + step(i), jnp.zeros((), jnp.float32)
        )

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chain(n))
        return time.perf_counter() - t0

    run(short)  # compile + warm
    if long is None:
        est = max((run(short + 14) - run(short)) / 14, 1e-6)
        long = short + int(min(2048, max(10, target / est)))
    t_short = min(run(short) for _ in range(repeats))
    t_long = min(run(long) for _ in range(repeats))
    return max((t_long - t_short) / (long - short), 1e-12)


def compiled_flops(jitted, *args):
    """XLA's FLOP estimate for one call of a jitted function (the compiled
    executable's cost analysis; works on the remote TPU backend)."""
    analysis = jitted.lower(*args).compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


# Peak dense matmul throughput per chip, FLOP/s (bf16 inputs, fp32
# accumulate — the MXU path XLA uses for both bf16 and default-precision
# fp32 matmuls here). TPU v5e: 197 TFLOP/s.
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5e": 197e12}


def peak_flops(device=None):
    """Best-effort peak FLOP/s for the current (or given) device; None if
    unknown (callers should then skip MFU reporting)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for name, peak in PEAK_FLOPS.items():
        if name in kind:
            return peak
    return None


def host_rss_bytes():
    """Resident set size of this process (reads /proc/self/status; None on
    platforms without procfs)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        return None
    return None


def device_memory_stats(device=None):
    """Per-device allocator stats (`bytes_in_use`, `peak_bytes_in_use`, …)
    where the backend exposes them; None otherwise (CPU and some remote
    runtimes don't)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    return stats or None


def memory_report(device=None):
    """One-line host+device memory summary.

    Working TPU-native replacement for the reference's dormant `print_RAM`
    flag (reference: MSGM_higherDim.py:397 — defined, never used): host RSS
    from procfs plus device HBM in-use/peak where the runtime reports it.
    """
    parts = []
    rss = host_rss_bytes()
    if rss is not None:
        parts.append(f"host rss {rss / 2**20:,.0f} MiB")
    stats = device_memory_stats(device)
    if stats:
        in_use = stats.get("bytes_in_use")
        peak = stats.get("peak_bytes_in_use")
        limit = stats.get("bytes_limit")
        dev = []
        if in_use is not None:
            dev.append(f"in_use {in_use / 2**20:,.0f} MiB")
        if peak is not None:
            dev.append(f"peak {peak / 2**20:,.0f} MiB")
        if limit is not None:
            dev.append(f"limit {limit / 2**20:,.0f} MiB")
        if dev:
            parts.append("device " + " ".join(dev))
    return "RAM: " + (", ".join(parts) if parts else "unavailable")


def attention_flops(batch, spatial, channels):
    """Matmul FLOPs of one attention block: two (T², C) contractions
    (reference thop counter, model/unet.py:252-273 counts MACs; this is
    2·MACs = FLOPs)."""
    t = int(np.prod(spatial))
    return 2 * 2 * batch * t * t * channels


def param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
