"""Fused GroupNorm(+SiLU) kernel.

The reference applies GroupNorm32 then SiLU as separate modules
(model/nn_utils.py:39-46, used in every ResBlock / the output head). Fused
here: per-(batch, group) fp32 statistics, normalization, affine, and the
SiLU all happen in one VMEM-resident Pallas block per batch element —
one HBM read and one write per activation instead of several.

Epsilon is 1e-5 (torch GroupNorm's default, which the reference inherits).
Autodiff dispatches to the identical jnp math (see ops/pallas/common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdeflow_tpu.ops.pallas.common import nn_kernels_enabled, interpret_mode

EPS = 1e-5


def _bcast(g_vals, gmap_t):
    """(1, G) group values -> (1, C) channel values via the one-hot map.
    HIGHEST precision: this is a value *copy*, any matmul truncation would
    corrupt the statistics themselves. (pltpu.repeat tiles whole vectors —
    g0 g1 ... g0 g1 ... — which is the wrong, interleaved layout here.)"""
    return jnp.dot(g_vals, gmap_t, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _gn_math(x, gamma, beta, groups, silu):
    """Reference jnp implementation: x (B, S, C), statistics in fp32 over
    (S, C/G) per group (reference GroupNorm32, model/nn_utils.py:39-46).

    Two formulations, dispatched on compute dtype (both measured on TPU,
    tools/gn_micro.py + tools/unet_bf16_diag.py):

    - fp32 x: the 4D (B, S, G, C/G) reshape with everything in fp32 —
      bit-identical to the reference GroupNorm32 and the form XLA fuses
      best into a pure-fp32 network (the folded-affine variant measured
      +1.0 ms in-context on the 16x16 U-Net at B=2048 fp32).
    - sub-fp32 x (bf16 compute mode): channel-sums-first statistics in
      fp32 (never the minor-dim-1 reshape), then the normalize+affine
      folded to one multiply-add *in x.dtype*. Stats stay exact; the
      elementwise apply matches the surrounding network precision, so the
      op fuses with its bf16 neighbours instead of forming an fp32 island
      (in-context: B=256 full forward 1.24 -> 1.09 ms, B=2048 10.23 ->
      9.45 ms, UNET_BF16_DIAG.json)."""
    b, s, c = x.shape
    if jnp.dtype(x.dtype).itemsize >= 4:
        xg = x.astype(jnp.float32).reshape(b, s, groups, c // groups)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        h = (xg - mean) * jax.lax.rsqrt(var + EPS)
        h = h.reshape(b, s, c) * gamma + beta
    else:
        cg = c // groups
        n = jnp.float32(s * cg)
        xf = x.astype(jnp.float32)
        g_mean = jnp.sum(xf, axis=1).reshape(b, groups, cg).sum(-1) / n
        mean_c = jnp.repeat(g_mean, cg, axis=-1)  # (B, C)
        xc = xf - mean_c[:, None, :]
        g_var = jnp.sum(xc * xc, axis=1).reshape(b, groups, cg).sum(-1) / n
        rstd_c = jnp.repeat(jax.lax.rsqrt(g_var + EPS), cg, axis=-1)
        scale = (rstd_c * gamma).astype(x.dtype)
        shift = (beta - mean_c * rstd_c * gamma).astype(x.dtype)
        h = x * scale[:, None, :] + shift[:, None, :]
    if silu:
        h = h * jax.nn.sigmoid(h)
    return h.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, gmap_ref, o_ref, *, groups, silu):
    """Batch-tiled kernel: each grid step normalizes a (Bb, S, C) tile.
    Group stats use a one-hot (C, G) matmul instead of a lane-splitting
    reshape (which Mosaic rejects) or a per-group loop (which serializes):
    per-sample channel sums -> group sums on the MXU -> broadcast back."""
    x = x_ref[:].astype(jnp.float32)  # (Bb, S, C)
    bb, s, c = x.shape
    cg = c // groups
    gmap = gmap_ref[:]  # (C, G) one-hot group membership
    n = jnp.float32(s * cg)
    ch_sum = jnp.sum(x, axis=1)  # (Bb, C)
    g_mean = _bcast(ch_sum, gmap) / n  # (Bb, G)
    mean_c = _bcast(g_mean, gmap.T)  # (Bb, C)
    # two-pass variance (x is VMEM-resident, the second pass is cheap) —
    # the one-pass E[x²]−E[x]² form loses ~3 digits here
    xc = x - mean_c[:, None, :]
    ch_sq = jnp.sum(xc * xc, axis=1)
    g_var = _bcast(ch_sq, gmap) / n
    rstd_c = _bcast(jax.lax.rsqrt(g_var + EPS), gmap.T)
    h = xc * (rstd_c * gamma_ref[:])[:, None, :] + beta_ref[:]
    if silu:
        h = h * jax.nn.sigmoid(h)
    o_ref[:] = h.astype(o_ref.dtype)


_BATCH_BLOCK = 32
# per-buffer VMEM budget for picking the batch tile: the kernel keeps ~6
# fp32 (blk, S, C) intermediates alive, and Mosaic pads C to the 128-lane
# tile — at C=32 that is 4x the logical size, which a fixed blk=32 blows
# straight through the 16 MB scoped-vmem limit on (B=2048, S=256, C=32)
_VMEM_PER_BUFFER = 2 << 20


def _gn_pallas(x, gamma, beta, groups, silu):
    b, s, c = x.shape
    c_padded = ((c + 127) // 128) * 128
    fit = max(1, _VMEM_PER_BUFFER // (s * c_padded * 4))
    blk = min(_BATCH_BLOCK, b, fit)
    gmap = (
        jnp.repeat(jnp.eye(groups, dtype=jnp.float32), c // groups, axis=0)
        if groups > 1
        else jnp.ones((c, 1), jnp.float32)
    )
    return pl.pallas_call(
        partial(_gn_kernel, groups=groups, silu=silu),
        grid=(pl.cdiv(b, blk),),
        in_specs=[
            pl.BlockSpec((blk, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret_mode(),
    )(x, gamma.reshape(1, c), beta.reshape(1, c), gmap)


@partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def group_norm_silu(x, gamma, beta, groups, silu=True):
    """Fused GroupNorm(+SiLU): x (B, S, C) channels-last, gamma/beta (C,)."""
    if nn_kernels_enabled():
        return _gn_pallas(x, gamma, beta, groups, silu)
    return _gn_math(x, gamma, beta, groups, silu)


@group_norm_silu.defjvp
def _gn_jvp(groups, silu, primals, tangents):
    return jax.jvp(
        lambda x, g, b: _gn_math(x, g, b, groups, silu), primals, tangents
    )
