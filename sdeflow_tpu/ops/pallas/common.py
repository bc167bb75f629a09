"""Shared Pallas kernel plumbing.

Dispatch policy for every kernel in this package:

- **Primal (no differentiation)** — the Pallas TPU kernel runs. This is the
  generation/sampling hot path (reverse-SDE solves are under
  `lax.stop_gradient` / no grad), where the fused kernels keep each block's
  intermediates in VMEM.
- **Under autodiff (jvp/vjp)** — a `jax.custom_jvp` rule dispatches to the
  mathematically identical jnp implementation, so XLA's autodiff (including
  the SSM loss's forward-mode JVP) differentiates the pure-jnp graph.
  Training therefore trains through XLA; sampling samples through Pallas.
- **Off-TPU** — the jnp implementation runs (Pallas interpret mode is
  reserved for tests, via force_interpret()).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

_FORCE_INTERPRET = False
_DISABLE = os.environ.get("SDEFLOW_DISABLE_PALLAS", "0") == "1"


@contextmanager
def force_interpret():
    """Run Pallas kernels in interpreter mode (CPU tests)."""
    global _FORCE_INTERPRET
    prev = _FORCE_INTERPRET
    _FORCE_INTERPRET = True
    try:
        yield
    finally:
        _FORCE_INTERPRET = prev


def interpret_mode() -> bool:
    return _FORCE_INTERPRET


def pallas_enabled() -> bool:
    """Use the compiled Pallas path on TPU, or anywhere under
    force_interpret(); otherwise fall back to jnp."""
    if _DISABLE:
        return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


_NN_KERNELS = os.environ.get("SDEFLOW_PALLAS_NN", "0") == "1"
_FLASH_VJP = os.environ.get("SDEFLOW_FLASH_VJP", "0") == "1"


def flash_vjp_enabled() -> bool:
    """Opt-in gate for the reverse-mode Pallas flash-attention pair
    (fwd kernel + one-pass backward kernel via custom_vjp).

    Measured on v5e at T=4096/C=64/B=4 (tools/measure_perf.py --section
    flash_bwd, PERF_MEASURED.json `attn_bwd_T4096_*`): grad through the
    remat-tiled jnp flash math runs 0.685 ms vs 1.22 ms for the hand-written
    Pallas pair (XLA fuses the recompute-and-accumulate chain better than
    the one-pass kernel at these widths), so the default stays the
    custom_jvp + jnp-flash-math path — which additionally supports the SSM
    loss's forward-mode JVP. The kernels remain available (correct,
    interpret-tested) behind SDEFLOW_FLASH_VJP=1 for reverse-mode-only
    training at widths where the balance may flip; under it, forward-mode
    JVP through attention raises (custom_vjp functions are reverse-mode
    only)."""
    if _DISABLE:
        return False
    if _FORCE_INTERPRET:
        return _FLASH_VJP
    return _FLASH_VJP and jax.default_backend() == "tpu"


def nn_kernels_enabled() -> bool:
    """Opt-in gate for the attention / GroupNorm+SiLU kernels.

    Measured on v5e (see ops/pallas/README note in each module): at this
    framework's layer sizes (T ≤ 256, C ≤ 128) the fused kernels are at
    parity with XLA's own fusion at best, and every distinct (B, S, C)
    layer shape costs a separate Mosaic compile — minutes of extra compile
    for no run-time win. XLA already fuses these memory-bound chains well
    at small widths. The kernels stay correct and tested; enable with
    SDEFLOW_PALLAS_NN=1 for large-width models where the (T², C) attention
    tile or wide GroupNorm rows stop fitting XLA's fusion heuristics.
    The circulant diffusion stencil (a measured 1.6x win, one shape) stays
    on by default via pallas_enabled().
    """
    if _DISABLE:
        return False
    if _FORCE_INTERPRET:
        return True
    return _NN_KERNELS and jax.default_backend() == "tpu"
