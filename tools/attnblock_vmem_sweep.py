"""Batch-tile (VMEM budget) sweep for the fused AttentionBlock kernel.

ATTNBLOCK_MICRO.json shows the dominant shape — (B=2048, T=64, C=64), 5
blocks in the 16x16 U-Net — running ~10x off its HBM floor (0.40 ms vs
0.041). The VMEM estimate caps the batch tile at blk=64 there (32 grid
steps); per-step fixed costs (DMA latency, semaphores) then dominate.
This sweeps SDEFLOW_ATTN_VMEM_MB in {14 (default), 18, 22, 24} at that
shape, both dtypes, and writes ATTNBLOCK_VMEM_SWEEP.json. A Mosaic
scoped-vmem OOM at a given budget is recorded as "oom" for that cell.

Run on the real TPU: python tools/attnblock_vmem_sweep.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ATTNBLOCK_VMEM_SWEEP.json")

B, T, C = 2048, 64, 64


def bench(dtype):
    from sdeflow_tpu.ops.pallas import attnblock
    from sdeflow_tpu.utils import device_seconds

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (B, T, C), dtype)
    args = (
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.02,
        jnp.zeros((3 * C,), jnp.float32),
        jax.random.normal(ks[2], (C, C), jnp.float32) * 0.02,
        jnp.zeros((C,), jnp.float32),
    )
    sec = device_seconds(
        lambda i: attnblock.fused_attention_block(
            x + 1e-6 * i, *args, 32).mean().astype(jnp.float32),
        short=1,
    )
    return round(sec * 1e3, 4)


def main():
    res = {"backend": jax.default_backend(), "shape": f"b{B}_t{T}c{C}"}
    for mb in (14, 18, 22, 24):
        os.environ["SDEFLOW_ATTN_VMEM_MB"] = str(mb)
        for tag, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
            k = f"vmem{mb}_{tag}_ms"
            try:
                res[k] = bench(dtype)
            except Exception as e:  # Mosaic scoped-vmem OOM etc.
                res[k] = f"error: {type(e).__name__}: {str(e)[:120]}"
            print(k, res[k], flush=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
