"""Sample-quality metrics: Gaussian-kernel MMD and sliced Wasserstein.

TPU-native rewrite of the reference's MMD (reference:
quantitative_comparison.py:22-46). The reference materializes the full
(N, N, d) broadcast difference tensor; here each kernel block is computed
from the ‖a‖² + ‖b‖² − 2·a·bᵀ expansion — the pairwise term is a matmul on
the MXU — and the (N, N) matrix is never materialized: a lax.scan walks row
blocks and accumulates the kernel mean on device.

Kernel parity: k(x, y) = exp(−‖x−y‖²/d²) — the reference divides the
squared distance by d twice (a .mean(2) then /dim,
quantitative_comparison.py:32). Reported metric is √MMD
(MSGM_higherDim.py:940-948).

Sliced Wasserstein is provided alongside (BASELINE.json names SWD; the
reference implements MMD — we ship both).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _block_kernel_sum(xb, y, dim, valid_mask, centered):
    """Sum of exp(-‖a−b‖²/d²) (or expm1, centered=True) over a row block,
    masking padded rows."""
    x2 = jnp.sum(xb**2, axis=1)[:, None]
    y2 = jnp.sum(y**2, axis=1)[None, :]
    sq = x2 + y2 - 2.0 * (xb @ y.T)
    sq = jnp.maximum(sq, 0.0)
    e = -sq / (dim * dim)
    k = jnp.expm1(e) if centered else jnp.exp(e)
    return jnp.sum(k * valid_mask[:, None])


@partial(jax.jit, static_argnames=("block", "centered"))
def compute_kernel_mean(x, y, block=1024, centered=False):
    """Mean of the Gaussian kernel over all (x_i, y_j) pairs, tiled.

    centered=True returns the mean of k−1 (expm1 of the exponent): at
    large d the reference's /d² bandwidth makes every kernel entry ≈ 1,
    so sums of k lose all their information to the leading 1 — the
    centered mean keeps it (the 1s cancel exactly in the MMD combination
    below)."""
    n, dim = x.shape
    num_blocks = -(-n // block)
    pad = num_blocks * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((n,), x.dtype), (0, pad))
    xp = xp.reshape(num_blocks, block, dim)
    valid = valid.reshape(num_blocks, block)

    def body(acc, inp):
        xb, vb = inp
        return acc + _block_kernel_sum(
            xb, y, jnp.asarray(dim, x.dtype), vb, centered
        ), None

    total, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), (xp, valid))
    return total / (n * y.shape[0])


def compute_mmd(x, y, block=1024):
    """MMD² estimate k̄xx + k̄yy − 2k̄xy (reference:
    quantitative_comparison.py:38-46; biased V-statistic, like the
    reference). Report √MMD for parity with the driver.

    Computed from CENTERED kernel means (k−1 via expm1): mathematically
    identical — the three 1s cancel — but float32-stable. The naive
    combination subtracts three numbers that all approach 1 at large d
    (k = exp(−‖x−y‖²/d²) ≈ exp(−2/d) pairwise), a catastrophic
    cancellation that quantizes the result to ulp(1) ≈ 6e-8: measured on
    the d=64 bf16 ablation, two different trained models produced
    bitwise-identical mmd² = 4.0174e-5. The centered form resolves ~30×
    finer there and degrades gracefully as d grows."""
    kxx = compute_kernel_mean(x, x, block=block, centered=True)
    kyy = compute_kernel_mean(y, y, block=block, centered=True)
    kxy = compute_kernel_mean(x, y, block=block, centered=True)
    return kxx + kyy - 2.0 * kxy


@partial(jax.jit, static_argnames=("num_projections", "p"))
def sliced_wasserstein(key, x, y, num_projections=128, p=2):
    """Sliced Wasserstein-p distance via random 1-D projections.

    Projects both sets onto `num_projections` uniform directions (one
    (N, d) × (d, L) matmul each), sorts along the sample axis, and averages
    the p-th power quantile differences. Requires equal sample counts
    (subsample to min(N) beforehand if needed).
    """
    assert x.shape[0] == y.shape[0], "subsample to equal N first"
    d = x.shape[1]
    dirs = jax.random.normal(key, (d, num_projections), dtype=x.dtype)
    dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
    px = jnp.sort(x @ dirs, axis=0)
    py = jnp.sort(y @ dirs, axis=0)
    return jnp.mean(jnp.abs(px - py) ** p) ** (1.0 / p)
