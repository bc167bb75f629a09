"""Fused circulant-G diffusion stencil.

The MSGM sparse diffusion action (g·w)_i = √β·c·(y_{i+1}w_i − y_{i−1}w_{i−1})
(see ops/gapply.py) is two rolls, two multiplies and a subtract — all
VPU-elementwise — fused into one Pallas block per batch tile via
`pltpu.roll`, replacing the reference's COO gather + scatter_add
(sde_scheme.py:27-32). In the reverse RK4 solve this op runs 4× per step ×
num_steps × batch; keeping it in one VMEM pass matters at d ≥ 256
(e.g. the 32×32 PIV config, d = 1024).

Autodiff dispatches to the identical jnp math (see ops/pallas/common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdeflow_tpu.ops.pallas.common import pallas_enabled, interpret_mode
from sdeflow_tpu.ops.gapply import CIRCULANT_COEF

_ROW_BLOCK = 256


def _circ_math(sqrt_beta, y, w):
    c = CIRCULANT_COEF
    yb = sqrt_beta * y
    return c * (jnp.roll(yb, -1, axis=-1) * w - jnp.roll(yb * w, 1, axis=-1))


def _circ_kernel(sb_ref, y_ref, w_ref, o_ref):
    y = y_ref[:]
    w = w_ref[:]
    d = y.shape[1]
    yb = sb_ref[:] * y
    # pltpu.roll requires non-negative shifts: roll(-1) == roll(d-1)
    o_ref[:] = CIRCULANT_COEF * (
        pltpu.roll(yb, shift=d - 1, axis=1) * w
        - pltpu.roll(yb * w, shift=1, axis=1)
    )


def _circ_pallas(sqrt_beta, y, w):
    b, d = y.shape
    blk = min(_ROW_BLOCK, b)
    # non-divisible batch: Pallas masks the partial last block (the stencil
    # only mixes within a row, so OOB rows never contaminate valid ones)
    return pl.pallas_call(
        _circ_kernel,
        grid=(pl.cdiv(b, blk),),
        in_specs=[
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), y.dtype),
        interpret=interpret_mode(),
    )(sqrt_beta, y, w)


@jax.custom_jvp
def circulant_apply(sqrt_beta, y, w):
    """(g·w) for the circulant G: sqrt_beta (B,1) or scalar, y/w (B, d).
    Uses the Pallas stencil when the feature dim is TPU-tile-worthy."""
    sb = jnp.broadcast_to(jnp.asarray(sqrt_beta, y.dtype),
                          (y.shape[0], 1))
    if pallas_enabled() and y.shape[-1] >= 128:
        return _circ_pallas(sb, y, w)
    return _circ_math(sb, y, w)


@circulant_apply.defjvp
def _circ_jvp(primals, tangents):
    sb, y, w = primals
    sb = jnp.broadcast_to(jnp.asarray(sb, y.dtype), (y.shape[0], 1))
    dsb, dy, dw = tangents
    dsb = (
        jnp.zeros_like(sb)
        if isinstance(dsb, jax.custom_derivatives.SymbolicZero)
        else jnp.broadcast_to(jnp.asarray(dsb, y.dtype), (y.shape[0], 1))
    )
    dy = jnp.zeros_like(y) if isinstance(dy, jax.custom_derivatives.SymbolicZero) else dy
    dw = jnp.zeros_like(w) if isinstance(dw, jax.custom_derivatives.SymbolicZero) else dw
    return jax.jvp(_circ_math, (sb, y, w), (dsb, dy, dw))
