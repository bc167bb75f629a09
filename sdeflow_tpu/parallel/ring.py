"""Ring attention: sequence-parallel exact attention over the device mesh.

The single-chip long-context path is the flash-tiled Pallas kernel
(ops/pallas/attention.py). When the sequence itself outgrows one chip's HBM
— or the model is already tensor/sequence-sharded — the TPU-native scale-out
is a ring: shard T over a mesh axis, keep each device's Q shard resident,
and rotate the K/V shards around the ring with `ppermute` while an online
softmax accumulates. Every (T/P, T/P) score tile is computed exactly once,
no (T, T) matrix ever exists on any chip, and the KV transfers ride ICI
overlapping the matmuls. Same math as the reference's QKVAttention
(model/unet.py:231-250): q and k pre-scaled by 1/c^(1/4), fp32 softmax.

No reference counterpart (single-device torch); this is the SURVEY §5
"long-context" row's multi-chip leg.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _local_ring_body(q, kv_shards, axis_name, num_devices):
    """Online-softmax accumulation over the ring of KV shards.

    q: (b, h, tl, ch) local queries, pre-scaled.
    kv_shards: (k, v) local shards, (b, h, tl, ch) each, pre-scaled k.
    """
    b, h, tl, ch = q.shape
    perm = [(i, (i + 1) % num_devices) for i in range(num_devices)]

    def accumulate(m, l, acc, k, v):
        s = jnp.einsum("bhtc,bhsc->bhts", q, k,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + p.sum(axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhts,bhsc->bhtc", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    def step(carry, _):
        m, l, acc, k, v = carry
        m, l, acc = accumulate(m, l, acc, k, v)
        # rotate the KV shard to the next device; XLA overlaps this
        # ppermute with the next step's matmuls
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return (m, l, acc, k, v), None

    m0 = jnp.full((b, h, tl, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, tl, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, tl, ch), jnp.float32)
    # constant-initialized carries are unvarying over the mesh axis while the
    # loop writes varying values back — mark them device-varying up front
    m0, l0, acc0 = (
        jax.lax.pcast(a, (axis_name,), to="varying") for a in (m0, l0, acc0)
    )
    k0, v0 = kv_shards
    # N-1 (accumulate, rotate) rounds, then a final accumulate — the last
    # KV rotation would only be discarded, so it is never issued
    (m, l, acc, k, v), _ = jax.lax.scan(
        step, (m0, l0, acc0, k0, v0), None, length=num_devices - 1
    )
    _, l, acc = accumulate(m, l, acc, k, v)
    return acc / l


def ring_attention(qkv, num_heads, mesh: Mesh, axis: str = "model"):
    """Exact QKV self-attention with the sequence axis sharded over `axis`.

    qkv: (B, T, 3C) with T divisible by the axis size. Returns (B, T, C)
    with the same output sharding. Numerically identical (up to fp
    accumulation order) to ops.pallas.attention's math; differentiable —
    XLA transposes the ppermutes in the backward, so the gradient is also
    a ring program.
    """
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    n_dev = mesh.shape[axis]
    if t % n_dev != 0:
        raise ValueError(f"T={t} not divisible by the {axis} axis ({n_dev})")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )
    def run(qkv_local):
        bl, tl, _ = qkv_local.shape
        qkv_h = qkv_local.reshape(bl, tl, num_heads, 3 * ch)
        # compute-dtype scale (see ops/pallas/attention._attention_math):
        # an fp32 scalar would promote q/k — and the score matmuls on
        # every ring hop — to fp32 in bf16 mode
        scale = (1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
                 ).astype(qkv_h.dtype)
        q = jnp.moveaxis(qkv_h[..., :ch] * scale, 2, 1)          # (b,h,tl,ch)
        k = jnp.moveaxis(qkv_h[..., ch : 2 * ch] * scale, 2, 1)
        v = jnp.moveaxis(qkv_h[..., 2 * ch :], 2, 1)
        out = _local_ring_body(q, (k, v), axis, n_dev)            # (b,h,tl,ch)
        return jnp.moveaxis(out.astype(qkv_local.dtype), 1, 2).reshape(
            bl, tl, c
        )

    return run(qkv)
