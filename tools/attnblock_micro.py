"""Isolated AttentionBlock timing at the 16x16 U-Net's two attention shapes.

The b2048 bf16 forward spends ~4.3 ms of 9.4 ms in its 11 attention blocks
(UNET_BF16_DIAG.json: full - no_attention), yet those blocks hold only
~60 GFLOP of matmul work (~0.15 ms at peak MXU) and ~0.5 ms of HBM traffic.
This tool times ONE block at each shape the model instantiates —
(B, T=64, C=64) at the 8x8 level (5 blocks) and (B, T=16, C=128) at the
4x4 level (6 blocks) — through three paths:

  pallas  : ops/pallas/attnblock.fused_attention_block (the default no-grad
            TPU path)
  xla     : the identical jnp composition (_attn_block_math), jitted
  floor_ms: the HBM roofline (one read + one write of x at 819 GB/s v5e)

so the per-block overhead over the roofline is measured, not guessed.
Writes ATTNBLOCK_MICRO.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sdeflow_tpu.ops.pallas.attnblock import (
    _attn_block_math,
    fused_attention_block,
)
from sdeflow_tpu.utils import device_seconds

HBM_GBPS = 819.0  # v5e


def bench_shape(b, t, c, dtype, groups=32):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, t, c), dtype)
    gn_scale = jnp.ones((c,), jnp.float32)
    gn_bias = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.float32) * 0.02
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.02
    bproj = jnp.zeros((c,), jnp.float32)
    args = (gn_scale, gn_bias, wqkv, bqkv, wproj, bproj)

    out = {}

    def run(fn, tag):
        sec = device_seconds(
            lambda i: fn(x + 1e-6 * i, *args, groups).mean().astype(
                jnp.float32),
            short=1,
        )
        out[f"{tag}_ms"] = round(sec * 1e3, 4)

    run(fused_attention_block, "pallas")
    run(jax.jit(_attn_block_math, static_argnums=7), "xla")
    nbytes = 2 * b * t * c * jnp.dtype(dtype).itemsize
    out["floor_ms"] = round(nbytes / (HBM_GBPS * 1e9) * 1e3, 4)
    flops = 2 * b * t * c * (3 * c + c) + 2 * b * t * t * c * 2
    out["matmul_gflop"] = round(flops / 1e9, 2)
    return out


def main():
    res = {"backend": jax.default_backend()}
    for b in (256, 2048):
        for tag, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
            for t, c, nblocks in ((64, 64, 5), (16, 128, 6)):
                k = f"b{b}_t{t}c{c}_{tag}"
                r = bench_shape(b, t, c, dtype)
                r["blocks_in_model"] = nblocks
                res[k] = r
                print(k, r, flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ATTNBLOCK_MICRO.json"), "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print("wrote ATTNBLOCK_MICRO.json")


if __name__ == "__main__":
    main()
