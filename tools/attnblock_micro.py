"""Fused-AttentionBlock variant micro-benchmark at the 16x16 U-Net's two
in-context attention shapes, B=2048 (VERDICT r3 #1/#2 follow-up: after the
GroupNorm fix the bf16 forward's remaining non-conv time is the 11
attention blocks, ~4.3 ms of 9.45 ms; their matmul cores are worth ~1.6 ms
at the attn_micro rates, so ~2.7 ms rides on kernel structure).

Variants, measured per (T, C) at both dtypes:

  cur     the shipped _attn_block_pallas (fp32 internal activations,
          10 MB VMEM budget)
  blk     cur with the VMEM budget raised to 14 MB (larger batch tile ->
          fewer grid steps, better DMA/compute overlap)
  native  compute-dtype internals: GN stats in fp32 (channel sums via
          fp32-accum one-hot matmuls) but normalize/qkv/proj/residual all
          in x.dtype — mirrors the measured-winning _gn_math bf16 form
  packed  native + two T=64 samples packed into one 128-row score tile
          (cross-sample quadrants masked before softmax): fills the MXU's
          128 lanes at C=64/T=64 where unpacked matmuls run quarter-full
  math    the unfused jnp composition under jit (XLA fusion baseline)

Writes ATTNBLOCK_MICRO.json.  Run on the real TPU:
    python tools/attnblock_micro.py
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ATTNBLOCK_MICRO.json")
EPS = 1e-5


def _native_kernel(x_ref, gn_scale_ref, gn_bias_ref, gmap_ref, wqkv_ref,
                   bqkv_ref, wproj_ref, bproj_ref, o_ref, *, groups, pack):
    x = x_ref[:]  # (Bb, T, C) compute dtype
    bb, t, c = x.shape
    gmap = gmap_ref[:]
    n = jnp.float32(t * (c // groups))
    hp = jax.lax.Precision.HIGHEST

    def bcast(vals, m):
        return jnp.dot(vals, m, preferred_element_type=jnp.float32,
                       precision=hp)

    xf = x.astype(jnp.float32)
    ch_sum = jnp.sum(xf, axis=1)
    g_mean = bcast(ch_sum, gmap) / n
    mean_c = bcast(g_mean, gmap.T)  # (Bb, C) fp32
    xc = xf - mean_c[:, None, :]
    g_var = bcast(jnp.sum(xc * xc, axis=1), gmap) / n
    rstd_c = bcast(jax.lax.rsqrt(g_var + EPS), gmap.T)
    gam = gn_scale_ref[:]
    scale = (rstd_c * gam).astype(x.dtype)
    shift = (gn_bias_ref[:] - mean_c * rstd_c * gam).astype(x.dtype)
    h = x * scale[:, None, :] + shift[:, None, :]  # compute dtype

    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)

    att_scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(c, jnp.float32)))
    q = qkv[:, :, :c] * att_scale.astype(x.dtype)
    k = qkv[:, :, c : 2 * c] * att_scale.astype(x.dtype)
    v = qkv[:, :, 2 * c :]
    if pack > 1:
        q = q.reshape(bb // pack, pack * t, c)
        k = k.reshape(bb // pack, pack * t, c)
        v = v.reshape(bb // pack, pack * t, c)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if pack > 1:
        tt = pack * t
        row = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 0) // t
        col = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 1) // t
        s = jnp.where((row == col)[None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if pack > 1:
        out = out.reshape(bb, t, c)
    out = jax.lax.dot_general(
        out.astype(x.dtype), wproj_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _native_call(x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj, groups,
                 budget=14 << 20, pack=1):
    b, t, c = x.shape
    padf = lambda nn: ((nn + 127) // 128) * 128  # noqa: E731
    itemsize = jnp.dtype(x.dtype).itemsize
    # live per batch elem (compute-dtype internals): x + h + qkv + scores
    # (fp32) + p + out (fp32)
    bytes_per_elem = t * (
        padf(c) * itemsize * 2 + padf(3 * c) * itemsize
        + padf(t) * (4 + itemsize) + padf(c) * 4 * 2
    )
    fit = max(1, budget // bytes_per_elem)
    fit = 1 << (fit.bit_length() - 1)
    blk = min(fit, b)
    blk = max(blk, pack)
    gmap = (
        jnp.repeat(jnp.eye(groups, dtype=jnp.float32), c // groups, axis=0)
        if groups > 1
        else jnp.ones((c, 1), jnp.float32)
    )
    row = lambda nn: pl.BlockSpec((1, nn), lambda i: (0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_native_kernel, groups=groups, pack=pack),
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
        interpret=_interp(),
    )(x, gn_scale.reshape(1, c), gn_bias.reshape(1, c), gmap,
      wqkv, bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c))


def _interp():
    from sdeflow_tpu.ops.pallas.common import interpret_mode

    return interpret_mode()


def main():
    import sdeflow_tpu.ops.pallas.attnblock as AB
    from sdeflow_tpu.utils import device_seconds

    out = {"backend": jax.default_backend()}
    key = jax.random.PRNGKey(0)
    b = 2048
    for t, c in ((64, 64), (16, 128)):
        groups = 32
        ks = jax.random.split(key, 8)
        x32 = jax.random.normal(ks[0], (b, t, c))
        gn_scale = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
        gn_bias = jax.random.normal(ks[2], (c,)) * 0.1
        wqkv32 = jax.random.normal(ks[3], (c, 3 * c)) / jnp.sqrt(c)
        bqkv32 = jax.random.normal(ks[4], (3 * c,)) * 0.01
        wproj32 = jax.random.normal(ks[5], (c, c)) / jnp.sqrt(c)
        bproj32 = jax.random.normal(ks[6], (c,)) * 0.01

        for dtag, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
            x = x32.astype(dt)
            wqkv, bqkv = wqkv32.astype(dt), bqkv32.astype(dt)
            wproj, bproj = wproj32.astype(dt), bproj32.astype(dt)
            args = (x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj)

            variants = {
                "cur": jax.jit(partial(AB._attn_block_pallas, groups=groups)),
                "blk": jax.jit(partial(_call_cur_budget, groups=groups)),
                "native": jax.jit(partial(_native_call, groups=groups)),
                "math": jax.jit(partial(AB._attn_block_math, groups=groups)),
            }
            if t == 64:
                variants["packed"] = jax.jit(
                    partial(_native_call, groups=groups, pack=2))
            ref = None
            for name, fn in variants.items():
                try:
                    y = fn(*args)
                except Exception as e:  # noqa: BLE001
                    print(f"T{t}C{c} {name} {dtag} FAILED: {e}", flush=True)
                    continue
                kname = f"T{t}C{c}_{name}_{dtag}"
                if ref is None:
                    ref = y.astype(jnp.float32)
                else:
                    out[kname + "_maxdiff"] = float(
                        jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))
                sec = device_seconds(
                    lambda i, fn=fn, x=x: fn(
                        x + jnp.asarray(0, dt) * i, gn_scale, gn_bias,
                        wqkv, bqkv, wproj, bproj,
                    ).astype(jnp.float32).mean(),
                    short=1,
                )
                out[kname + "_us"] = round(sec * 1e6, 2)
                print(kname, out[kname + "_us"], "us",
                      out.get(kname + "_maxdiff", ""), flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1))


def _call_cur_budget(x, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj, groups):
    """The shipped kernel with a 14 MB VMEM budget (monkeypatched fit)."""
    import sdeflow_tpu.ops.pallas.attnblock as AB

    b, t, c = x.shape
    padf = lambda nn: ((nn + 127) // 128) * 128  # noqa: E731
    itemsize = jnp.dtype(x.dtype).itemsize
    bytes_per_elem = t * (
        padf(c) * 4 * 2 + padf(c) * itemsize + padf(3 * c) * itemsize
        + 2 * padf(t) * 4 + padf(c) * 4
    )
    fit = max(1, (14 << 20) // bytes_per_elem)
    fit = 1 << (fit.bit_length() - 1)
    blk = min(fit, b)
    gmap = (
        jnp.repeat(jnp.eye(groups, dtype=jnp.float32), c // groups, axis=0)
        if groups > 1
        else jnp.ones((c, 1), jnp.float32)
    )
    row = lambda nn: pl.BlockSpec((1, nn), lambda i: (0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(AB._attn_block_kernel, groups=groups),
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
        interpret=_interp(),
    )(x, gn_scale.reshape(1, c), gn_bias.reshape(1, c), gmap,
      wqkv, bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c))


if __name__ == "__main__":
    main()
