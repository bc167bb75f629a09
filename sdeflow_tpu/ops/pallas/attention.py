"""Fused QKV self-attention kernel.

The reference's QKVAttention (model/unet.py:231-250) is three separate ops
(two einsums + a softmax) with HBM round-trips between them in eager torch.
Here the whole attention core — per-head √√c-scaled score matmul, fp32
softmax, value matmul — runs as ONE Pallas kernel per batch element, with
q/k/v and the (T, T) score tile resident in VMEM and both matmuls on the
MXU. Sequence lengths in this framework are small (T = H·W ≤ 1024 for the
32×32 images), so the un-tiled single-block form is the right shape: no
online-softmax machinery needed, but the kernel is still the building block
a flash-style tiling would extend.

Autodiff dispatches to the identical jnp math (see ops/pallas/common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdeflow_tpu.ops.pallas.common import nn_kernels_enabled, interpret_mode


def _attention_math(qkv, num_heads):
    """Reference jnp implementation (identical math to the kernel)."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    qkv = qkv.reshape(b, t, num_heads, 3 * ch)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
    w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, c)


def _attn_kernel(qkv_ref, o_ref, *, num_heads):
    # Batch-tiled: each grid step attends over a (Bb, T, 3C) tile with
    # batched MXU matmuls. Heads use a static loop over 2D channel slices —
    # Mosaic rejects 3D shape casts that split the lane dimension, and H is
    # tiny (1-8) here.
    qkv = qkv_ref[:]  # (Bb, T, 3C)
    bb, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
    for h in range(num_heads):
        base = h * 3 * ch
        q = qkv[:, :, base : base + ch] * scale
        k = qkv[:, :, base + ch : base + 2 * ch] * scale
        v = qkv[:, :, base + 2 * ch : base + 3 * ch]
        # (Bb, T, S) scores on the MXU, fp32 softmax accumulate
        w = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            w, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * ch : (h + 1) * ch] = o.astype(o_ref.dtype)


_BATCH_BLOCK = 16


def _attention_pallas(qkv, num_heads):
    b, t, c3 = qkv.shape
    c = c3 // 3
    blk = min(_BATCH_BLOCK, b)
    return pl.pallas_call(
        partial(_attn_kernel, num_heads=num_heads),
        grid=(pl.cdiv(b, blk),),
        in_specs=[
            pl.BlockSpec((blk, t, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        interpret=interpret_mode(),
    )(qkv)


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def qkv_attention(qkv, num_heads=1):
    """Fused attention: qkv (B, T, 3C) -> (B, T, C)."""
    if nn_kernels_enabled():
        return _attention_pallas(qkv, num_heads)
    return _attention_math(qkv, num_heads)


@qkv_attention.defjvp
def _qkv_attention_jvp(num_heads, primals, tangents):
    (qkv,) = primals
    (dqkv,) = tangents
    return jax.jvp(lambda q: _attention_math(q, num_heads), (qkv,), (dqkv,))
