"""Measure the long-sequence attention BACKWARD on the real TPU:
jax.grad through the flash-math scan (O(T·block) memory autodiff path)
vs through the dense (T, T) reference at T=4096.

Run: python tools/measure_flash_bwd.py  (real chip; keep compiles small —
both paths are pure XLA programs, no Mosaic involved).
"""

import json
import time

import jax
import jax.numpy as jnp

from sdeflow_tpu.ops.pallas.attention import (
    _attention_math,
    _attention_flash_math,
)


def time_grad(fn, qkv):
    # Device time per op = slope between two chained-run lengths. Chaining
    # (out = g(out)) serializes device work by data dependency; the final
    # host transfer syncs (through the remote axon tunnel block_until_ready
    # does NOT await, and the ~300 ms result transfer would otherwise
    # pollute a per-iteration average).
    import numpy as np

    g = jax.grad(lambda q: (fn(q, 1) ** 2).sum())

    @jax.jit
    def chain(q, iters):
        # the whole chain is ONE device program (dynamic-bound while loop),
        # so host/tunnel jitter never lands between iterations
        return jax.lax.fori_loop(0, iters, lambda i, x: g(x), q)

    def run(iters):
        t0 = time.perf_counter()
        np.asarray(chain(qkv, iters))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t_short = min(run(10) for _ in range(3))
    t_long = min(run(210) for _ in range(3))
    return (t_long - t_short) / 200


def main():
    t, c, b = 4096, 64, 4
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, t, 3 * c))

    dense_s = time_grad(_attention_math, qkv)
    flash_s = time_grad(_attention_flash_math, qkv)

    # compiled memory evidence on the same platform
    shape = jax.ShapeDtypeStruct((b, t, 3 * c), jnp.float32)

    def temp_bytes(fn):
        g = jax.jit(jax.grad(lambda q: (fn(q, 1) ** 2).sum()))
        return g.lower(shape).compile().memory_analysis().temp_size_in_bytes

    print(json.dumps({
        "T": t, "C": c, "B": b,
        "dense_grad_ms": dense_s * 1e3,
        "flash_grad_ms": flash_s * 1e3,
        "speedup": dense_s / flash_s,
        "dense_temp_mb": temp_bytes(_attention_math) / 1e6,
        "flash_temp_mb": temp_bytes(_attention_flash_math) / 1e6,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
