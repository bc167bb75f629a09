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


# -- fused RK4 forward step (SURVEY §7 step 8) --------------------------------
#
# For the MSGM FORWARD flow the Stratonovich drift is zero, so one RK4 step
# is four stencil stages sharing one Wiener increment plus the combine — all
# VPU-elementwise. Fusing the whole step into one Pallas program removes the
# per-stage HBM round-trips of the unfused path (XLA fuses within a stage
# but rematerializes x+k/2 between pallas_call stage boundaries).


def _rk4_math_fwd(sb3, x, w):
    """jnp reference: identical composition to ops.integrators.rk4_step on a
    zero-drift flow whose sigma is the circulant stencil (stage times t,
    t+δ/2, t+δ/2, t+δ; shared dW; reference sde_scheme.py:222-253)."""
    k1 = _circ_math(sb3[:, 0:1], x, w)
    k2 = _circ_math(sb3[:, 1:2], x + 0.5 * k1, w)
    k3 = _circ_math(sb3[:, 1:2], x + 0.5 * k2, w)
    k4 = _circ_math(sb3[:, 2:3], x + k3, w)
    return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0


def _rk4_kernel(sb_ref, x_ref, w_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:]
    d = x.shape[1]
    sb = sb_ref[:]

    def stage(sb_col, xi):
        yb = sb_col * xi
        return CIRCULANT_COEF * (
            pltpu.roll(yb, shift=d - 1, axis=1) * w
            - pltpu.roll(yb * w, shift=1, axis=1)
        )

    k1 = stage(sb[:, 0:1], x)
    k2 = stage(sb[:, 1:2], x + 0.5 * k1)
    k3 = stage(sb[:, 1:2], x + 0.5 * k2)
    k4 = stage(sb[:, 2:3], x + k3)
    o_ref[:] = x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) * (1.0 / 6.0)


def _rk4_pallas(sb3, x, w):
    b, d = x.shape
    blk = min(_ROW_BLOCK, b)
    return pl.pallas_call(
        _rk4_kernel,
        grid=(pl.cdiv(b, blk),),
        in_specs=[
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        interpret=interpret_mode(),
    )(sb3, x, w)


@jax.custom_jvp
def circulant_rk4_step(sb3, x, w):
    """One fused RK4 step of the zero-drift circulant flow.

    sb3: (B, 3) √β at stage times (t, t+δ/2, t+δ); x, w: (B, d) state and
    Wiener increment. Pallas-fused on TPU; identical jnp math elsewhere and
    under autodiff."""
    sb3 = jnp.broadcast_to(jnp.asarray(sb3, x.dtype), (x.shape[0], 3))
    if pallas_enabled() and x.shape[-1] >= 128:
        return _rk4_pallas(sb3, x, w)
    return _rk4_math_fwd(sb3, x, w)


@circulant_rk4_step.defjvp
def _rk4_jvp(primals, tangents):
    sb3, x, w = primals
    sb3 = jnp.broadcast_to(jnp.asarray(sb3, x.dtype), (x.shape[0], 3))
    dsb3, dx, dw = tangents

    def _mat(tan, like):
        if isinstance(tan, jax.custom_derivatives.SymbolicZero):
            return jnp.zeros_like(like)
        return jnp.broadcast_to(jnp.asarray(tan, like.dtype), like.shape)

    return jax.jvp(
        _rk4_math_fwd,
        (sb3, x, w),
        (_mat(dsb3, sb3), _mat(dx, x), _mat(dw, w)),
    )


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
