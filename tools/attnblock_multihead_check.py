"""Real-Mosaic validation + timing of the multi-head fused AttentionBlock.

Interpret-mode tests (tests/test_pallas_kernels.py) prove the math; this
checks the heads>1 kernel actually LOWERS through Mosaic on the chip (the
static per-head lane slices at sub-128 offsets and the fp32 head concat
are the risky parts) and records per-block timing vs the jnp math at the
U-Net shapes. Writes ATTNBLOCK_MULTIHEAD.json.

Run on the real TPU: python tools/attnblock_multihead_check.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ATTNBLOCK_MULTIHEAD.json")


def main():
    from sdeflow_tpu.ops.pallas.attnblock import (
        _attn_block_math, fused_attention_block,
    )
    from sdeflow_tpu.utils import device_seconds

    res = {"backend": jax.default_backend()}
    key = jax.random.PRNGKey(0)
    b = 2048
    for heads in (2, 4):
        for t, c in ((64, 64), (16, 128)):
            ks = jax.random.split(jax.random.fold_in(key, heads * t), 3)
            x = jax.random.normal(ks[0], (b, t, c), jnp.bfloat16)
            args = (
                jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                jax.random.normal(ks[1], (c, 3 * c), jnp.float32) * 0.02,
                jnp.zeros((3 * c,), jnp.float32),
                jax.random.normal(ks[2], (c, c), jnp.float32) * 0.02,
                jnp.zeros((c,), jnp.float32),
            )
            tag = f"h{heads}_t{t}c{c}_bf16"
            out_k = fused_attention_block(x, *args, 32, heads)
            ref = _attn_block_math(x, *args, 32, heads)
            maxdiff = float(jnp.max(jnp.abs(
                out_k.astype(jnp.float32) - ref.astype(jnp.float32))))
            res[tag + "_maxdiff"] = round(maxdiff, 5)
            sec = device_seconds(
                lambda i: fused_attention_block(
                    x + 1e-6 * i, *args, 32, heads).mean().astype(
                        jnp.float32),
                short=1,
            )
            res[tag + "_pallas_ms"] = round(sec * 1e3, 4)
            sec = device_seconds(
                lambda i: _attn_block_math(
                    x + 1e-6 * i, *args, 32, heads).mean().astype(
                        jnp.float32),
                short=1,
            )
            res[tag + "_xla_ms"] = round(sec * 1e3, 4)
            print(tag, {k: v for k, v in res.items() if k.startswith(tag)},
                  flush=True)
            assert maxdiff < 0.06, f"{tag} kernel-vs-math maxdiff {maxdiff}"
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
