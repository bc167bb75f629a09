"""Integrator correctness: exact OU moments, trajectory shapes, select-gather.

These promote the reference's inline diagnostics (SURVEY.md §4) into real
tests: weak accuracy on an analytically solvable OU process, norm
conservation under re-projection, and equivalence of the memory-light
`integrate_select` with the full-trajectory gather.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from sdeflow_tpu.ops.integrators import (
    integrate_sde,
    integrate_select,
    em_step,
    heun_step,
    rk4_step,
)


@struct.dataclass
class OUFlow:
    """dX = −θX dt + σ dB (additive noise: Itô drift = Stratonovich drift)."""

    theta: jnp.ndarray
    sigma: jnp.ndarray
    T: jnp.ndarray

    def mu(self, t, y, lmbd=0.0):
        return -self.theta * y

    def mu_strato(self, t, y, lmbd=0.0):
        return -self.theta * y

    def sigma_apply(self, t, y, w, lmbd=0.0):
        return self.sigma * w


def ou_flow(theta=1.5, sigma=0.8, T=1.0):
    return OUFlow(
        theta=jnp.asarray(theta), sigma=jnp.asarray(sigma), T=jnp.asarray(T)
    )


@pytest.mark.parametrize("method", ["em", "heun", "rk4"])
def test_ou_exact_moments(rng, method):
    theta, sigma, T = 1.5, 0.8, 1.0
    flow = ou_flow(theta, sigma, T)
    n = 200_000
    x0 = jnp.full((n, 2), 2.0)
    xT = jax.jit(
        lambda k: integrate_sde(flow, x0, k, 64, method=method)
    )(rng)
    mean_th = 2.0 * np.exp(-theta * T)
    var_th = sigma**2 / (2 * theta) * (1 - np.exp(-2 * theta * T))
    assert np.allclose(np.mean(np.asarray(xT)), mean_th, atol=0.02)
    assert np.allclose(np.var(np.asarray(xT)), var_th, atol=0.02)


def test_weak_order_improves_with_steps(rng):
    """Halving dt must shrink the weak error of the mean (deterministic part
    of OU is exactly integrated by RK4, so test EM where discretization bias
    is visible)."""
    theta, sigma, T = 3.0, 0.5, 1.0
    flow = ou_flow(theta, sigma, T)
    x0 = jnp.full((100_000, 1), 1.0)
    mean_th = np.exp(-theta * T)
    errs = []
    for steps in (8, 64):
        xT = integrate_sde(flow, x0, rng, steps, method="em")
        errs.append(abs(float(jnp.mean(xT)) - mean_th))
    assert errs[1] < errs[0]


def test_keep_all_shapes(rng):
    flow = ou_flow()
    x0 = jnp.ones((4, 3))
    traj = integrate_sde(flow, x0, rng, 10, keep_all=True)
    assert traj.shape == (10, 4, 3)
    traj0 = integrate_sde(flow, x0, rng, 10, keep_all=True, include_t0=True)
    assert traj0.shape == (11, 4, 3)
    assert jnp.allclose(traj0[0], x0)
    # same key => same path
    assert jnp.allclose(traj0[1:], traj)
    final = integrate_sde(flow, x0, rng, 10)
    assert jnp.allclose(final, traj[-1])


def test_norm_correction_preserves_norm(rng):
    flow = ou_flow(theta=0.0, sigma=2.0)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (16, 8))
    xT = integrate_sde(flow, x0, rng, 20, norm_correction=True)
    n0 = jnp.linalg.norm(x0, axis=1)
    nT = jnp.linalg.norm(xT, axis=1)
    assert jnp.allclose(n0, nT, rtol=1e-5)


def test_integrate_select_matches_trajectory_gather(rng):
    flow = ou_flow()
    B, d, steps = 32, 3, 12
    x0 = jax.random.normal(jax.random.PRNGKey(3), (B, d))
    idx = jax.random.randint(jax.random.PRNGKey(4), (B,), 0, steps + 1)
    traj = integrate_sde(flow, x0, rng, steps, keep_all=True, include_t0=True)
    gathered = jnp.take_along_axis(traj, idx[None, :, None], axis=0)[0]
    # take_along_axis over axis 0 with per-batch index
    gathered = traj[idx, jnp.arange(B)]
    selected = integrate_select(flow, x0, rng, steps, select_idx=idx)
    assert jnp.allclose(selected, gathered, atol=1e-6)


def test_steps_agree_on_zero_noise():
    """With σ=0 and linear drift all three schemes reduce to their ODE
    counterparts; RK4 must beat Heun must beat Euler on exp decay."""
    flow = ou_flow(theta=2.0, sigma=0.0, T=1.0)
    x0 = jnp.ones((1, 1))
    key = jax.random.PRNGKey(0)
    exact = np.exp(-2.0)
    errs = {}
    for method in ("em", "heun", "rk4"):
        xT = integrate_sde(flow, x0, key, 16, method=method)
        errs[method] = abs(float(xT[0, 0]) - exact)
    assert errs["rk4"] < errs["heun"] < errs["em"]


@struct.dataclass
class RotationFlow:
    """dY = σ J Y ∘ dB with a SINGLE shared Brownian motion (first noise
    component): exact solution Y_t = R(σ B_t) Y_0 — the norm-preserving toy
    whose analytic law underlies the low-rank MSGM figures."""

    sigma: jnp.ndarray
    T: jnp.ndarray

    def mu(self, t, y, lmbd=0.0):
        return -0.5 * self.sigma**2 * y  # Itô correction of the rotation

    def mu_strato(self, t, y, lmbd=0.0):
        return jnp.zeros_like(y)

    def sigma_apply(self, t, y, w, lmbd=0.0):
        jy = jnp.stack([-y[:, 1], y[:, 0]], axis=1)
        return self.sigma * jy * w[:, :1]


def test_rk4_matches_exact_rotation_pathwise(rng):
    """Strong (pathwise) accuracy: reconstruct the integrator's own Wiener
    increments (fold_in schedule) and compare against the exact rotation
    R(σ B_t) Y0 — RK4-Stratonovich must track the exact path closely and
    the error must shrink with dt."""
    sigma, T = 0.8, 1.0
    flow = RotationFlow(sigma=jnp.asarray(sigma), T=jnp.asarray(T))
    B, d = 64, 2
    x0 = jnp.tile(jnp.asarray([[1.5, 0.5]]), (B, 1))
    errs = {}
    for steps in (16, 64):
        out = integrate_sde(flow, x0, rng, steps, method="rk4")
        # reconstruct the same dW sequence the scan used
        delta = T / steps
        bt = jnp.zeros((B,))
        for i in range(steps):
            dW = jnp.sqrt(delta) * jax.random.normal(
                jax.random.fold_in(rng, i), (B, d)
            )
            bt = bt + dW[:, 0]
        theta = sigma * bt
        exact = jnp.stack(
            [
                x0[:, 0] * jnp.cos(theta) - x0[:, 1] * jnp.sin(theta),
                x0[:, 0] * jnp.sin(theta) + x0[:, 1] * jnp.cos(theta),
            ],
            axis=1,
        )
        errs[steps] = float(jnp.abs(out - exact).max())
    assert errs[64] < errs[16]
    assert errs[64] < 0.05
    # norm preserved by the scheme (without explicit correction) to O(dt)
    out64 = integrate_sde(flow, x0, rng, 64, method="rk4")
    n = jnp.linalg.norm(out64, axis=1)
    assert float(jnp.abs(n - jnp.linalg.norm(x0, axis=1)).max()) < 0.02
