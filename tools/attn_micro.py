"""Micro-benchmark the SHORT-sequence attention core at the 16x16 U-Net's
exact shapes (B=2048; T=64 C=64 and T=16 C=128; num_heads=1) — the roofline
ablation (tools/unet_roofline.py) shows these blocks cost ~5.2 ms of the
10.97 ms bf16 forward while their FLOPs are worth ~0.3 ms. Variants:

  math      — ops.pallas.attention._attention_math (the production path)
  h1        — heads==1 specialization: plain (B,T,C) batched matmuls, no
              per-head reshape/moveaxis layouts
  pallas    — the batch-tiled single-block Pallas kernel

Writes attn_micro rows into UNET_ROOFLINE.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "UNET_ROOFLINE.json")


def _attention_math_h1(qkv, num_heads=1):
    assert num_heads == 1
    b, t, c3 = qkv.shape
    c = c3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(c, jnp.float32)))
    w = jnp.einsum("btc,bsc->bts", q * scale, k * scale,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bts,bsc->btc", w, v)


def main():
    from sdeflow_tpu.ops.pallas.attention import (
        _attention_math, _attention_pallas,
    )
    from sdeflow_tpu.utils import device_seconds
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    for dtype_tag, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        for t, c in ((64, 64), (16, 128)):
            qkv = jax.random.normal(
                jax.random.PRNGKey(0), (2048, t, 3 * c)
            ).astype(dtype)
            for name, fn in (("math", _attention_math),
                             ("h1", _attention_math_h1),
                             ("pallas", _attention_pallas)):
                sec = device_seconds(
                    lambda i: fn(qkv + jnp.asarray(1e-6 * i, dtype), 1)
                    .astype(jnp.float32).mean(),
                    short=2,
                )
                key = f"attn_micro_T{t}C{c}_{name}_{dtype_tag}_us"
                out[key] = round(sec * 1e6, 2)
                print(key, out[key], flush=True)

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged.update(out)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
