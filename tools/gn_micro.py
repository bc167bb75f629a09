"""GroupNorm formulation microbenchmark (VERDICT r3 #1 follow-up).

UNET_BF16_DIAG.json attributes the 16x16 U-Net's bf16-vs-fp32 loss at
B=256 mostly to the GroupNorm+SiLU chains (0.315 ms bf16 vs 0.145 fp32)
and the attention blocks. The production GN path (`_gn_math`,
ops/pallas/groupnorm.py) reshapes the activation to (B, S, G, C/G) —
minor dim C/G = 1 at C=32 — and materializes it in fp32. This tool
measures three formulations at the U-Net's hot shapes, both dtypes:

  cur   the shipped _gn_math (4D reshape, fp32 elementwise)
  v2    (B,C)-statistics form: sum over S first, group-reduce the tiny
        (B,C) array, broadcast back; fp32 elementwise (same numerics
        class as cur — stats AND normalization in fp32)
  v3    v2 with the elementwise normalize in x.dtype (stats still fp32;
        mean/rstd cast to bf16 before the broadcast subtract/multiply)

plus max|diff| of each vs cur in fp64-free fp32 reference terms.
Writes GN_MICRO.json. Run on the real TPU: python tools/gn_micro.py
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "GN_MICRO.json")
EPS = 1e-5


def gn_cur(x, gamma, beta, groups, silu=True):
    from sdeflow_tpu.ops.pallas.groupnorm import _gn_math

    return _gn_math(x, gamma, beta, groups, silu)


def gn_v2(x, gamma, beta, groups, silu=True):
    b, s, c = x.shape
    cg = c // groups
    n = jnp.float32(s * cg)
    xf = x.astype(jnp.float32)
    g_mean = jnp.sum(xf, axis=1).reshape(b, groups, cg).sum(-1) / n  # (B,G)
    mean_c = jnp.repeat(g_mean, cg, axis=-1)  # (B,C)
    xc = xf - mean_c[:, None, :]
    g_var = jnp.sum(xc * xc, axis=1).reshape(b, groups, cg).sum(-1) / n
    rstd_c = jnp.repeat(jax.lax.rsqrt(g_var + EPS), cg, axis=-1)
    h = xc * (rstd_c * gamma)[:, None, :] + beta
    if silu:
        h = h * jax.nn.sigmoid(h)
    return h.astype(x.dtype)


def gn_v3(x, gamma, beta, groups, silu=True):
    b, s, c = x.shape
    cg = c // groups
    n = jnp.float32(s * cg)
    xf = x.astype(jnp.float32)
    g_mean = jnp.sum(xf, axis=1).reshape(b, groups, cg).sum(-1) / n
    mean_c = jnp.repeat(g_mean, cg, axis=-1)
    xcf = xf - mean_c[:, None, :]
    g_var = jnp.sum(xcf * xcf, axis=1).reshape(b, groups, cg).sum(-1) / n
    rstd_c = jnp.repeat(jax.lax.rsqrt(g_var + EPS), cg, axis=-1)
    scale = (rstd_c * gamma).astype(x.dtype)  # (B,C) in compute dtype
    shift = (beta - mean_c * rstd_c * gamma).astype(x.dtype)
    h = x * scale[:, None, :] + shift[:, None, :]
    if silu:
        h = h * jax.nn.sigmoid(h)
    return h


def main():
    from sdeflow_tpu.utils import device_seconds

    out = {"backend": jax.default_backend()}
    key = jax.random.PRNGKey(0)
    # the 16x16 U-Net's three GN shapes (S = spatial, C = channels) at the
    # two measured batch sizes
    shapes = [(256, 256, 32), (256, 64, 64), (256, 16, 128),
              (2048, 256, 32), (2048, 64, 64), (2048, 16, 128)]
    fns = {"cur": gn_cur, "v2": gn_v2, "v3": gn_v3}
    for b, s, c in shapes:
        groups = min(32, c)
        gamma = jax.random.normal(key, (c,)) * 0.1 + 1.0
        beta = jax.random.normal(jax.random.fold_in(key, 1), (c,)) * 0.1
        x32 = jax.random.normal(jax.random.fold_in(key, 2), (b, s, c))
        for dtag, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = x32.astype(dt)
            ref = None
            for name, fn in fns.items():
                f = jax.jit(partial(fn, groups=groups))
                sec = device_seconds(
                    lambda i, f=f, x=x: f(x + jnp.asarray(0, dt) * i,
                                          gamma, beta).mean()
                    .astype(jnp.float32),
                    short=1,
                )
                k = f"b{b}_s{s}_c{c}_{name}_{dtag}"
                out[k + "_us"] = round(sec * 1e6, 2)
                y = f(x, gamma, beta)
                if ref is None:
                    ref = y.astype(jnp.float32)
                else:
                    out[k + "_maxdiff"] = float(
                        jnp.max(jnp.abs(y.astype(jnp.float32) - ref))
                    )
                print(k, out[k + "_us"], "us",
                      out.get(k + "_maxdiff", ""), flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
