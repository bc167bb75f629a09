"""Fully fused AttentionBlock kernel: GroupNorm -> qkv projection ->
single-head attention core -> output projection -> residual, in ONE Pallas
program per batch tile.

Motivation (tools/unet_roofline.py, UNET_ROOFLINE.json): the 16x16 U-Net's
11 attention blocks cost ~5.2 ms of the 10.97 ms bf16 forward at B=2048
while holding ~0.3 ms of MXU work — the rest is HBM round trips between the
~10 XLA ops per block (GN stats, affine, qkv matmul, head layouts, fp32
softmax spill, proj, residual). Fusing the whole block keeps every
intermediate in VMEM: one read of x, one write of the output.

Scope: num_heads in 1..8 (every reference image config defaults
num_heads=1, model/unet.py:276-552; heads > 1 widens the kernel to
beyond-reference configs) and sequences that fit VMEM (T <= 256 covers all
16x16/32x32 configs). The dispatcher falls back to the unfused module path
otherwise. Same math as models.unet2d.AttentionBlock's composition
(reference model/unet.py:198-250): GroupNorm32 eps 1e-5, qk pre-scaled by
1/ch^(1/4), fp32 softmax, zero-init proj; heads split the qkv channels in
the reference's interleaved per-head [q_h k_h v_h] layout
(ops/pallas/attention._attention_math), via a static per-head loop in the
kernel — Mosaic rejects 3D shape casts that split the lane dim.

Autodiff: custom_jvp -> the identical jnp composition (`_attn_block_math`),
so both reverse mode and the SSM loss's forward-mode JVP differentiate pure
jnp (the package-wide dispatch policy, ops/pallas/common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdeflow_tpu.ops.pallas.common import pallas_enabled, interpret_mode
from sdeflow_tpu.ops.pallas.groupnorm import EPS, _gn_math


def _attn_block_math(x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj, groups,
                     heads=1):
    """The unfused jnp composition (autodiff + off-TPU path). x: (B, T, C)."""
    h = _gn_math(x, gn_scale, gn_bias, groups, False)
    qkv = h @ wqkv.astype(h.dtype) + bqkv.astype(h.dtype)
    b, t, c = x.shape
    ch = c // heads
    # cast the qk scale to the compute dtype: a concrete fp32 scalar would
    # PROMOTE q/k to fp32 and the score matmul (and its whole JVP/VJP in
    # training) would run with fp32 operands — measured as the entire bf16
    # train-step regression (TRAIN_BF16_DIAG.json: attention backward
    # +0.94 ms while conv/GN backward was 0.5 ms FASTER in bf16).
    # Accumulation stays fp32 via preferred_element_type, like the kernel.
    scale = (1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
             ).astype(qkv.dtype)
    if heads == 1:
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        w = jnp.einsum("btc,bsc->bts", q * scale, k * scale,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        out = jnp.einsum("bts,bsc->btc", w, v)
    else:
        # interleaved per-head [q_h k_h v_h] channel layout, matching
        # ops/pallas/attention._attention_math (the unfused module path)
        qkv_h = qkv.reshape(b, t, heads, 3 * ch)
        q, k, v = jnp.split(qkv_h, 3, axis=-1)
        w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, c)
    out = out @ wproj.astype(out.dtype) + bproj.astype(out.dtype)
    return x + out


def _attn_block_kernel(x_ref, gn_scale_ref, gn_bias_ref, gmap_ref, wqkv_ref,
                       bqkv_ref, wproj_ref, bproj_ref, o_ref, *, groups,
                       pack, heads):
    x = x_ref[:]  # (Bb, T, C) compute dtype
    bb, t, c = x.shape
    # sub-fp32 compute dtypes keep activations native end to end (fp32 is
    # reserved for GN statistics and softmax scores), mirroring _gn_math's
    # measured-winning bf16 dispatch: the folded one-multiply-add affine
    # and the residual run in x.dtype, halving the live VMEM set so the
    # batch tile (and with it DMA/compute overlap) doubles
    native = jnp.dtype(x.dtype).itemsize < 4

    # --- GroupNorm (fp32 stats, the one-hot group matmul from groupnorm.py)
    gmap = gmap_ref[:]  # (C, G) one-hot membership
    n = jnp.float32(t * (c // groups))
    hp = jax.lax.Precision.HIGHEST

    def bcast(vals, m):
        return jnp.dot(vals, m, preferred_element_type=jnp.float32,
                       precision=hp)

    xf = x.astype(jnp.float32)
    ch_sum = jnp.sum(xf, axis=1)                     # (Bb, C)
    mean_c = bcast(bcast(ch_sum, gmap) / n, gmap.T)  # (Bb, C)
    xc = xf - mean_c[:, None, :]
    g_var = bcast(jnp.sum(xc * xc, axis=1), gmap) / n
    rstd_c = bcast(jax.lax.rsqrt(g_var + EPS), gmap.T)
    gn_w = rstd_c * gn_scale_ref[:]
    if native:
        # expand the unit dim in fp32 and cast AFTER: Mosaic rejects the
        # (Bb, C) -> (Bb, 1, C) shape cast on sub-fp32 vectors
        gn_shift = gn_bias_ref[:] - mean_c * gn_w
        h = (x * gn_w[:, None, :].astype(x.dtype)
             + gn_shift[:, None, :].astype(x.dtype))
    else:
        h = (xc * gn_w[:, None, :] + gn_bias_ref[:]).astype(o_ref.dtype)

    # --- qkv projection: (Bb, T, C) @ (C, 3C) on the MXU (M = Bb*T rows)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)
    qkv = qkv.astype(h.dtype)

    # --- single-head attention core (batched over Bb, scores in fp32).
    # At the U-Net's shapes (T=64 or 16) the per-sample score/out matmuls
    # are far below the 128x128 MXU tile, so `pack` samples are merged
    # into one block-diagonal attention of length pack*T: the matmuls run
    # MXU-aligned and the batch loop shrinks by `pack`; a SELECT mask (not
    # an additive -inf) restores exact per-sample softmax — on a grid-edge
    # tile Pallas pads the block with undefined VMEM contents, and a select
    # discards a padded neighbour's garbage scores even when they decode to
    # NaN/Inf (garbage + -inf would be NaN and poison the softmax row of a
    # REAL sample sharing the pack group).
    ch = c // heads
    scale = (1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
             ).astype(qkv.dtype)  # keep the score matmul operands in x.dtype
    if pack > 1:
        pt = pack * t
        row = jax.lax.broadcasted_iota(jnp.int32, (pt, pt), 0) // t
        col = jax.lax.broadcasted_iota(jnp.int32, (pt, pt), 1) // t
        same = row == col

    def head_core(q, k, v):
        # q, k, v: (Bb, T, ch) -> fp32 (Bb, T, ch)
        if pack > 1:
            q = q.reshape(bb // pack, pt, ch)
            k = k.reshape(bb // pack, pt, ch)
            v = v.reshape(bb // pack, pt, ch)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Bb/pack, pack*T, pack*T)
        if pack > 1:
            s = jnp.where(same[None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return o.reshape(bb, t, ch) if pack > 1 else o

    if heads == 1:
        out = head_core(qkv[:, :, :c] * scale, qkv[:, :, c : 2 * c] * scale,
                        qkv[:, :, 2 * c :])
    else:
        # static per-head loop over interleaved [q_h k_h v_h] channel
        # slices (the module path's head layout); Mosaic rejects the
        # lane-splitting (Bb, T, C) -> (Bb, T, H, ch) shape cast
        outs = []
        for hh in range(heads):
            base = hh * 3 * ch
            outs.append(head_core(
                qkv[:, :, base : base + ch] * scale,
                qkv[:, :, base + ch : base + 2 * ch] * scale,
                qkv[:, :, base + 2 * ch : base + 3 * ch],
            ))
        out = jnp.concatenate(outs, axis=-1)  # (Bb, T, C) fp32

    # --- output projection + residual (fp32 accumulation in the matmul;
    # the add itself runs in compute dtype on the native path, matching
    # the _attn_block_math composition at sub-fp32 dtypes)
    out = jax.lax.dot_general(
        out.astype(qkv.dtype), wproj_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    if native:
        o_ref[:] = x + out.astype(x.dtype)
    else:
        o_ref[:] = (xf + out).astype(o_ref.dtype)


def _attn_block_pallas(x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj,
                       groups, heads=1):
    b, t, c = x.shape
    pad = lambda nn: ((nn + 127) // 128) * 128  # noqa: E731
    itemsize = jnp.dtype(x.dtype).itemsize
    # pack enough samples that the score matmul's M/N dims reach the
    # 128-wide MXU tile (power of two so it divides the batch tile)
    import os as _os
    _pk = _os.environ.get("SDEFLOW_ATTN_PACK", "")
    pack = int(_pk) if _pk else max(1, 128 // t)
    # the kernel reshapes by `pack`, so it must be a power of two (anything
    # else survives the 2-adic clamp below and fails at trace time with an
    # opaque size mismatch) — round an env override down
    pack = 1 << (max(1, pack).bit_length() - 1)
    # live per batch elem: x in compute dtype + fp32 centered copy (both
    # fp32 when compute IS fp32), h, qkv, fp32 scores + compute-dtype
    # softmax, fp32 attention output
    bytes_per_elem = t * (
        pad(c) * (itemsize + 4) + pad(c) * itemsize + pad(3 * c) * itemsize
        + pad(pack * t) * (4 + itemsize) + pad(c) * 4
    )
    # 14 MB estimate keeps the kernel under Mosaic's 16 MB scoped-vmem
    # stack limit (32 MB measured-OOM at the b2048 fp32 shape); the
    # estimate intentionally double-counts transients as slack.
    # SDEFLOW_ATTN_VMEM_MB overrides the budget (clamped to 1..24) for
    # batch-tile experiments — a bigger tile halves the grid-step count
    # (the T=64 kernel runs ~10x off its DMA floor, ATTNBLOCK_MICRO.json).
    _vm = _os.environ.get("SDEFLOW_ATTN_VMEM_MB", "")
    vmem_mb = max(1, min(24, int(_vm))) if _vm else 14
    fit = max(1, (vmem_mb << 20) // bytes_per_elem)
    fit = 1 << (fit.bit_length() - 1)
    blk = min(fit, b)
    # pack must divide the batch tile (both are powers of two unless the
    # whole batch is one odd tile — then shrink to its 2-adic part)
    pack = min(pack, blk & -blk)
    gmap = (
        jnp.repeat(jnp.eye(groups, dtype=jnp.float32), c // groups, axis=0)
        if groups > 1
        else jnp.ones((c, 1), jnp.float32)
    )
    row = lambda nn: pl.BlockSpec((1, nn), lambda i: (0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_block_kernel, groups=groups, pack=pack, heads=heads),
        grid=(pl.cdiv(b, blk),),
        in_specs=[
            pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(c), row(c),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(3 * c),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row(c),
        ],
        out_specs=pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret_mode(),
    )(x, gn_scale.reshape(1, c), gn_bias.reshape(1, c), gmap,
      wqkv, bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c))


_FUSED_MAX_T = 256


@partial(jax.custom_jvp, nondiff_argnums=(7, 8))
def fused_attention_block(x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj,
                          groups, heads=1):
    """x: (B, T, C) -> (B, T, C); the whole 1-8-head AttentionBlock.
    Pallas on the no-grad TPU path when T fits VMEM; jnp math otherwise."""
    if pallas_enabled() and x.shape[1] <= _FUSED_MAX_T:
        return _attn_block_pallas(x, gn_scale, gn_bias, wqkv, bqkv, wproj,
                                  bproj, groups, heads)
    return _attn_block_math(x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj,
                            groups, heads)


@fused_attention_block.defjvp
def _fused_attention_block_jvp(groups, heads, primals, tangents):
    return jax.jvp(
        lambda *a: _attn_block_math(*a, groups, heads), primals, tangents
    )
