"""Metrics: MMD closed-form parity, tiling invariance, SWD, survival tails."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.eval import (
    compute_mmd,
    compute_kernel_mean,
    sliced_wasserstein,
    forward_convergence_stats,
    filter_blowups,
    survival_analysis,
)


def _mmd_reference_np(x, y):
    """Direct O(N²) transcription of the reference kernel
    (quantitative_comparison.py:22-46) in numpy."""

    def k(a, b):
        d = a.shape[1]
        sq = ((a[:, None, :] - b[None, :, :]) ** 2).mean(2) / d
        return np.exp(-sq)

    return k(x, x).mean() + k(y, y).mean() - 2 * k(x, y).mean()


def test_mmd_matches_reference_formula(rng):
    k1, k2 = jax.random.split(rng)
    x = np.asarray(jax.random.normal(k1, (257, 3)))  # non-multiple of block
    y = np.asarray(jax.random.normal(k2, (191, 3)) + 0.5)
    ours = float(compute_mmd(jnp.asarray(x), jnp.asarray(y), block=64))
    ref = _mmd_reference_np(x, y)
    assert abs(ours - ref) < 1e-5


def test_mmd_tiling_invariance(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (500, 4))
    y = jax.random.normal(k2, (500, 4))
    a = float(compute_mmd(x, y, block=64))
    b = float(compute_mmd(x, y, block=512))
    assert abs(a - b) < 1e-6


def test_mmd_separates_distributions(rng):
    """MMD(two Gaussians with different means) ≫ MMD(same distribution) —
    the closed-form two-Gaussian oracle of SURVEY.md §4(g)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2000, 2))
    y = jax.random.normal(k2, (2000, 2))
    z = jax.random.normal(k3, (2000, 2)) + 2.0
    same = float(compute_mmd(x, y))
    diff = float(compute_mmd(x, z))
    assert diff > 20 * max(same, 1e-6)
    # analytic check: for N(0,I) vs N(m,I) in dim d with kernel
    # exp(-||a-b||²/d²), E k(x,y) has closed form via Gaussian integrals.
    d = 2
    gamma = 1.0 / d**2  # kernel = exp(-gamma ||a-b||²)
    s = 1.0 / (1.0 + 4.0 * gamma)  # (2σ² = 2 per difference coordinate)
    ekxx = s ** (d / 2)
    m2 = 4.0 * d  # ||m||² with m = (2,2)
    ekxz = s ** (d / 2) * np.exp(-gamma * s * m2)
    expected = 2 * (ekxx - ekxz)
    assert abs(diff - expected) < 0.02


def test_sliced_wasserstein(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (4000, 3))
    y = jax.random.normal(k2, (4000, 3))
    z = jax.random.normal(k3, (4000, 3)) * 3.0
    near = float(sliced_wasserstein(rng, x, y))
    far = float(sliced_wasserstein(rng, x, z))
    assert near < 0.1
    assert far > 5 * near


def test_forward_convergence_stats(rng):
    k1, k2 = jax.random.split(rng)
    x_test = jax.random.normal(k1, (5000, 4)) * 2.0
    x_fwd = jax.random.normal(k2, (5000, 4)) * 2.0  # already white
    stats = forward_convergence_stats(x_test, x_fwd)
    assert float(stats["d_cov_forward_to_wwn"]) < 0.05
    assert abs(float(stats["energy_ratio"]) - 1.0) < 0.05


def test_filter_blowups():
    x = np.ones((5, 2), np.float32)
    x[1, 0] = np.nan
    x[3, 1] = 2e3
    filtered, dropped = filter_blowups(x)
    assert dropped == 2
    assert filtered.shape == (3, 2)


def test_survival_tail_exponent(rng):
    """Pareto(α) norms must recover α from the log-log tail fit."""
    alpha = 3.0
    n = 50_000
    u = np.random.RandomState(0).rand(n)
    r = u ** (-1.0 / alpha)  # Pareto radii, S(R) = R^-alpha
    x = r[:, None] * np.array([[1.0, 0.0]])
    out = survival_analysis(x=jnp.asarray(x, jnp.float32), tail_frac=0.02)
    fit = out["fits"]["generated"]["alpha"]
    assert fit is not None
    # the grid-based OLS fit is biased upward on the extreme tail (same
    # estimator as the reference's, own_plotting.py:642-685) — check it
    # recovers the exponent to within the estimator's own bias
    assert abs(fit - alpha) < 1.0
    # gaussian reference has a much steeper (effectively larger) tail slope
    g = np.random.RandomState(1).randn(n, 2)
    out2 = survival_analysis(x=jnp.asarray(g, jnp.float32), tail_frac=0.02)
    assert out2["fits"]["generated"]["alpha"] > 2 * alpha


def test_mmd_no_catastrophic_cancellation(rng):
    """At large d the reference's /d² bandwidth makes every kernel entry
    ≈ 1, so the naive kxx + kyy − 2kxy subtracts three ~1.0 float32
    numbers and quantizes the MMD to ulp(1) ≈ 6e-8 (measured: two
    different trained models collided bitwise on the d=64 ablation).
    compute_mmd accumulates expm1(−s) instead — mathematically identical
    (the 1s cancel exactly) — and must match a float64 numpy reference
    far tighter than the uncentered float32 combination."""
    import numpy as np

    d, n = 64, 512
    x = np.asarray(jax.random.normal(rng, (n, d)))
    y = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1), (n, d)))
    y = 1.02 * y  # slightly-off distribution: small but nonzero MMD

    def mmd64(a, b):
        def km(u, v):
            sq = ((u[:, None, :] - v[None, :, :]) ** 2).sum(-1)
            return np.exp(-sq.astype(np.float64) / (d * d)).mean()

        return km(a, a) + km(b, b) - 2 * km(a, b)

    ref = mmd64(x, y)
    ours = float(compute_mmd(jnp.asarray(x), jnp.asarray(y)))
    # uncentered float32 combination (the old implementation)
    kxx = compute_kernel_mean(jnp.asarray(x), jnp.asarray(x))
    kyy = compute_kernel_mean(jnp.asarray(y), jnp.asarray(y))
    kxy = compute_kernel_mean(jnp.asarray(x), jnp.asarray(y))
    old = float(kxx + kyy - 2.0 * kxy)

    assert abs(ours - ref) < 5e-9, (ours, ref)
    assert abs(ours - ref) * 4 < abs(old - ref) + 1e-12, (ours, old, ref)

    # identical samples -> exactly zero (the 1s cancel exactly)
    assert float(compute_mmd(jnp.asarray(x), jnp.asarray(x))) == 0.0
