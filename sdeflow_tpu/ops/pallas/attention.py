"""Fused QKV self-attention kernel.

The reference's QKVAttention (model/unet.py:231-250) is three separate ops
(two einsums + a softmax) with HBM round-trips between them in eager torch.
Here the whole attention core — per-head √√c-scaled score matmul, fp32
softmax, value matmul — runs as ONE Pallas program with two shapes:

- short sequences (T = H·W ≤ 1024, every reference config): batch-tiled
  single-block kernel, the (T, T) score tile resident in VMEM, both
  matmuls on the MXU;
- long sequences (T > 1024): flash-style tiling — per (batch, q-tile) grid
  step an online softmax streams KV tiles, so the (T, T) scores are never
  materialized (at T = 4096 they would be 64 MB, 4× VMEM).

Autodiff dispatches to the identical jnp math (see ops/pallas/common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdeflow_tpu.ops.pallas.common import (
    nn_kernels_enabled,
    pallas_enabled,
    interpret_mode,
    flash_vjp_enabled,
)


def _attention_math(qkv, num_heads):
    """Reference jnp implementation (identical math to the kernel)."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    qkv = qkv.reshape(b, t, num_heads, 3 * ch)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # compute-dtype scale: a concrete fp32 scalar would promote the score
    # matmul operands (and their JVP/VJP in training) to fp32 — the
    # measured bf16 train regression (TRAIN_BF16_DIAG.json). Scores
    # accumulate in fp32 via preferred_element_type, like the kernels.
    scale = (1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
             ).astype(qkv.dtype)
    w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, c)


def _attention_flash_math(qkv, num_heads, kv_block=None):
    """Tiled online-softmax attention in plain jnp: the same math as
    `_attention_math`, but the KV axis is a `lax.scan` over kv_block tiles
    with a rematerialized body, so the (T, T) score matrix is never alive —
    peak activation memory is O(T·kv_block) per head in the primal, under
    `jax.grad` (the remat recomputes each tile's scores in the backward) AND
    under the SSM loss's forward-mode JVP. This is the long-sequence autodiff
    path the flash Pallas kernel (no-grad sampling) pairs with; the reference
    trains straight through its O(T²) attention (model/unet.py:231-250)."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    kv_block = kv_block or _FLASH_KV_BLOCK
    if t % kv_block != 0:
        return _attention_math(qkv, num_heads)
    nk = t // kv_block

    qkv_h = qkv.reshape(b, t, num_heads, 3 * ch)
    # compute-dtype scale (see _attention_math): keep q/k — and their
    # training JVP/VJP — in the compute dtype; tiles accumulate in fp32
    scale = (1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
             ).astype(qkv.dtype)
    q = qkv_h[..., :ch] * scale                       # (b, t, h, ch)
    k = (qkv_h[..., ch : 2 * ch] * scale).reshape(b, nk, kv_block, num_heads, ch)
    v = qkv_h[..., 2 * ch :].reshape(b, nk, kv_block, num_heads, ch)
    kt = jnp.moveaxis(k, 1, 0)                        # (nk, b, blk, h, ch)
    vt = jnp.moveaxis(v, 1, 0)

    @jax.checkpoint
    def body(carry, tile):
        m, l, acc = carry
        kb, vb = tile
        s = jnp.einsum("bthc,bshc->bhts", q, kb,
                       preferred_element_type=jnp.float32)  # (b, h, t, blk)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + p.sum(axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhts,bshc->bhtc", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, num_heads, t, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, num_heads, t, 1), jnp.float32)
    acc0 = jnp.zeros((b, num_heads, t, ch), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kt, vt))
    out = (acc / l).astype(qkv.dtype)                 # (b, h, t, ch)
    return jnp.moveaxis(out, 1, 2).reshape(b, t, c)


def _attention_reference(qkv, num_heads):
    """The jnp implementation autodiff differentiates through: flash-tiled
    above the long-sequence threshold (O(T) memory training), the plain
    (T, T) form below it (XLA fuses it best at small T)."""
    if qkv.shape[1] > _FLASH_SEQ_THRESHOLD:
        return _attention_flash_math(qkv, num_heads)
    return _attention_math(qkv, num_heads)


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

# flash tiling kicks in when the (T, T) score tile would pressure VMEM
_FLASH_SEQ_THRESHOLD = 1024
_FLASH_KV_BLOCK = 512


def _flash_kernel(qkv_ref, o_ref, *, num_heads, kv_block):
    """Flash-style tiled attention for long sequences: per (batch, q-tile)
    grid step, stream KV tiles with an online softmax (running max m,
    normalizer l, accumulator acc) so the (T, T) score matrix is never
    materialized — only (TQ, TK) tiles live in registers/VMEM. Same math as
    `_attention_math` (√√c scaling on q and k, fp32 softmax accumulate)."""
    t, c3 = qkv_ref.shape[1], qkv_ref.shape[2]
    c = c3 // 3
    ch = c // num_heads
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
    tq = o_ref.shape[1]  # the q tile spans this grid step's output rows
    qi = pl.program_id(1)
    num_kv = t // kv_block

    for h in range(num_heads):
        base = h * 3 * ch
        # dynamic tile reads go through the ref (Mosaic lowers pl.ds ref
        # indexing; dynamic_slice on loaded values is unsupported)
        q = qkv_ref[0, pl.ds(qi * tq, tq), base : base + ch] * scale

        def body(ki, carry):
            m, l, acc = carry
            k = qkv_ref[
                0, pl.ds(ki * kv_block, kv_block), base + ch : base + 2 * ch
            ] * scale
            v = qkv_ref[
                0, pl.ds(ki * kv_block, kv_block),
                base + 2 * ch : base + 3 * ch,
            ]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TQ, TK)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((tq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((tq, 1), jnp.float32)
        acc0 = jnp.zeros((tq, ch), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
        o_ref[0, :, h * ch : (h + 1) * ch] = (acc / l).astype(o_ref.dtype)


def _attention_flash(qkv, num_heads):
    b, t, c3 = qkv.shape
    c = c3 // 3
    kv_block = min(_FLASH_KV_BLOCK, t)
    tq = min(_FLASH_KV_BLOCK, t)
    if t % kv_block != 0 or t % tq != 0:
        raise ValueError(
            "flash attention requires the sequence length to be a multiple "
            f"of the tile size {kv_block}; got T={t}"
        )
    return pl.pallas_call(
        partial(_flash_kernel, num_heads=num_heads, kv_block=kv_block),
        grid=(b, t // tq),
        in_specs=[
            pl.BlockSpec((1, t, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        interpret=interpret_mode(),
    )(qkv)


def _attention_pallas(qkv, num_heads):
    b, t, c3 = qkv.shape
    c = c3 // 3
    # batch tile sized to VMEM: the dominant live buffers are the qkv tile,
    # the per-head fp32 score tile (blk, T, T) (~2 alive through the
    # softmax), and the output tile — all padded to 128 lanes. Larger tiles
    # amortize grid-step overhead: at (B=2048, T=64, C=64) blk=128 runs the
    # whole block in 16 grid steps instead of 128 (measured 4.4x, see
    # tools/attn_micro.py / UNET_ROOFLINE.json).
    pad = lambda n: ((n + 127) // 128) * 128  # noqa: E731
    itemsize = jnp.dtype(qkv.dtype).itemsize
    bytes_per_batch_elem = t * (
        pad(c3) * itemsize       # qkv tile row
        + 2 * pad(t) * 4         # score tile row (fp32, ~2 alive)
        + pad(c) * itemsize      # out tile row
    )
    fit = max(1, (10 << 20) // bytes_per_batch_elem)
    fit = 1 << (fit.bit_length() - 1)  # power of two tiles divide B evenly
    blk = min(fit, b)
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
    """Fused attention: qkv (B, T, 3C) -> (B, T, C).

    Long sequences (> _FLASH_SEQ_THRESHOLD) take the flash-tiled kernel
    (online softmax over KV tiles, never materializing the (T, T) scores) —
    default-on like the circulant stencil, a measured 1.9x win over XLA at
    T=4096. Short sequences use the single-block kernel behind the opt-in
    SDEFLOW_PALLAS_NN gate (parity with XLA's fusion at those sizes)."""
    t = qkv.shape[1]
    if (
        t > _FLASH_SEQ_THRESHOLD
        and t % _FLASH_KV_BLOCK == 0
        and pallas_enabled()
    ):
        return _attention_flash(qkv, num_heads)
    if nn_kernels_enabled():
        return _attention_pallas(qkv, num_heads)
    return _attention_reference(qkv, num_heads)


@qkv_attention.defjvp
def _qkv_attention_jvp(num_heads, primals, tangents):
    # autodiff (both modes) goes through the jnp reference — flash-tiled
    # with remat above the threshold, so jax.grad at T > 1024 stays O(T)
    # memory instead of rebuilding the (T, T) scores per head
    (qkv,) = primals
    (dqkv,) = tangents
    return jax.jvp(
        lambda q: _attention_reference(q, num_heads), (qkv,), (dqkv,)
    )


# ---------------------------------------------------------------------------
# Reverse-mode flash pair: fwd kernel emitting softmax stats + one-pass
# backward kernel, via custom_vjp (opt-in — see common.flash_vjp_enabled).

_BWD_KV_BLOCK = 128  # smaller tiles in the backward: ~4 (T, blk) fp32
#                      intermediates are live per head, vs 1 in the forward


def _flash_fwd_stats_kernel(qkv_ref, o_ref, lse_ref, *, num_heads, kv_block):
    """_flash_kernel plus the per-row log-sum-exp of the SCALED scores
    (lse = m + log l), which the backward needs to recompute p tiles."""
    t, c3 = qkv_ref.shape[1], qkv_ref.shape[2]
    c = c3 // 3
    ch = c // num_heads
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
    tq = o_ref.shape[1]
    qi = pl.program_id(1)
    num_kv = t // kv_block

    for h in range(num_heads):
        base = h * 3 * ch
        q = qkv_ref[0, pl.ds(qi * tq, tq), base : base + ch] * scale

        def body(ki, carry):
            m, l, acc = carry
            k = qkv_ref[
                0, pl.ds(ki * kv_block, kv_block), base + ch : base + 2 * ch
            ] * scale
            v = qkv_ref[
                0, pl.ds(ki * kv_block, kv_block),
                base + 2 * ch : base + 3 * ch,
            ]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((tq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((tq, 1), jnp.float32)
        acc0 = jnp.zeros((tq, ch), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
        o_ref[0, :, h * ch : (h + 1) * ch] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, h, :] = (m + jnp.log(l))[:, 0]


def _attention_flash_stats(qkv, num_heads):
    b, t, c3 = qkv.shape
    c = c3 // 3
    kv_block = min(_FLASH_KV_BLOCK, t)
    tq = min(_FLASH_KV_BLOCK, t)
    return pl.pallas_call(
        partial(_flash_fwd_stats_kernel, num_heads=num_heads,
                kv_block=kv_block),
        grid=(b, t // tq),
        in_specs=[
            pl.BlockSpec((1, t, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, tq), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, num_heads, t), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(qkv)


def _flash_bwd_kernel(qkv_ref, do_ref, lse_ref, delta_ref, dqkv_ref, *,
                      num_heads, kv_block):
    """One-pass flash backward (one grid step per batch row): for each KV
    tile, recompute the p tile from q, k and the saved lse, then form
    dV = pᵀ·dO, dS = p∘(dO·Vᵀ − Δ), dK = dSᵀ·q·scale, and accumulate
    dQ += dS·k·scale — the standard FlashAttention backward with Δ =
    rowsum(dO∘O) precomputed host-side. No (T, T) matrix is ever alive;
    per head only (T, kv_block) tiles exist."""
    t, c3 = qkv_ref.shape[1], qkv_ref.shape[2]
    c = c3 // 3
    ch = c // num_heads
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
    num_kv = t // kv_block

    for h in range(num_heads):
        base = h * 3 * ch
        q = qkv_ref[0, :, base : base + ch] * scale          # (t, ch)
        do = do_ref[0, :, h * ch : (h + 1) * ch].astype(jnp.float32)
        lse = lse_ref[0, h, :][:, None]                      # (t, 1)
        delta = delta_ref[0, h, :][:, None]                  # (t, 1)

        def body(ki, dq_acc):
            k = qkv_ref[
                0, pl.ds(ki * kv_block, kv_block), base + ch : base + 2 * ch
            ] * scale                                        # (blk, ch)
            v = qkv_ref[
                0, pl.ds(ki * kv_block, kv_block),
                base + 2 * ch : base + 3 * ch,
            ]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # (t, blk)
            p = jnp.exp(s - lse)
            dv = jax.lax.dot_general(                        # pᵀ·dO (blk, ch)
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(                        # dO·vᵀ (t, blk)
                do, v.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)
            dk = jax.lax.dot_general(                        # dSᵀ·q (blk, ch)
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[
                0, pl.ds(ki * kv_block, kv_block), base + ch : base + 2 * ch
            ] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[
                0, pl.ds(ki * kv_block, kv_block),
                base + 2 * ch : base + 3 * ch,
            ] = dv.astype(dqkv_ref.dtype)
            return dq_acc + jnp.dot(
                ds, k, preferred_element_type=jnp.float32
            ) * scale

        dq = jax.lax.fori_loop(
            0, num_kv, body, jnp.zeros((t, ch), jnp.float32)
        )
        dqkv_ref[0, :, base : base + ch] = dq.astype(dqkv_ref.dtype)


def _attention_flash_bwd(qkv, do, lse, delta, num_heads):
    b, t, c3 = qkv.shape
    c = c3 // 3
    kv_block = min(_BWD_KV_BLOCK, t)
    specs_btc = lambda ch3: pl.BlockSpec(  # noqa: E731
        (1, t, ch3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec((1, num_heads, t), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_flash_bwd_kernel, num_heads=num_heads, kv_block=kv_block),
        grid=(b,),
        in_specs=[specs_btc(c3), specs_btc(c), stat_spec, stat_spec],
        out_specs=specs_btc(c3),
        out_shape=jax.ShapeDtypeStruct((b, t, c3), qkv.dtype),
        interpret=interpret_mode(),
    )(qkv, do, lse, delta)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def flash_attention_vjp(qkv, num_heads=1):
    """Long-sequence attention with BOTH passes as Pallas kernels
    (reverse-mode only — forward-mode JVP raises by custom_vjp semantics;
    the SSM loss must keep using `qkv_attention`). Opt-in via
    SDEFLOW_FLASH_VJP=1 — see common.flash_vjp_enabled for the measured
    dispatch decision. Same math as `_attention_math`
    (reference model/unet.py:231-250)."""
    out, _ = _attention_flash_stats(qkv, num_heads)
    return out


def _flash_vjp_fwd(qkv, num_heads):
    out, lse = _attention_flash_stats(qkv, num_heads)
    return out, (qkv, out, lse)


def _flash_vjp_bwd(num_heads, res, g):
    qkv, out, lse = res
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    # Δ_h = rowsum(dO_h ∘ O_h): tiny elementwise reduce, XLA fuses it.
    # "bthc,bthc->bht" orders the output (b, num_heads, t) — the stats layout
    # the backward kernel reads.
    delta = jnp.einsum(
        "bthc,bthc->bht",
        g.reshape(b, t, num_heads, ch).astype(jnp.float32),
        out.reshape(b, t, num_heads, ch).astype(jnp.float32),
    )
    return (_attention_flash_bwd(qkv, g, lse, delta, num_heads),)


flash_attention_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def attention_core(qkv, num_heads=1):
    """The AttentionBlock entry point: the custom_jvp `qkv_attention` path
    by default; the reverse-mode Pallas pair when SDEFLOW_FLASH_VJP=1 and
    the sequence qualifies for flash tiling."""
    t = qkv.shape[1]
    if (
        flash_vjp_enabled()
        and t > _FLASH_SEQ_THRESHOLD
        and t % _FLASH_KV_BLOCK == 0
    ):
        return flash_attention_vjp(qkv, num_heads)
    return qkv_attention(qkv, num_heads)
