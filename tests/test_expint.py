"""DPM-Solver exponential integrators (ops/expint.py).

Oracle: Gaussian data x ~ N(m0, diag(v0)). Under the VP kernel the
marginal is p_s = N(alpha(s) m0, alpha(s)^2 v0 + sigma(s)^2), so the exact
score is available in closed form and a = sqrt(beta) * score is the exact
learned drift. With it, every sampler below should transport N(0, I)
latents to (approximately) the data law, and all deterministic ODE paths
share one exact solution map to converge to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.ops.expint import _grid, integrate_dpm, nfe
from sdeflow_tpu.ops.ode import integrate_ode
from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE, SGMSde

M0 = jnp.asarray([1.5, -0.5])
V0 = jnp.asarray([0.6, 1.8])


def _exact_gauss_gen(sde):
    """PluginReverseSDE whose `a` is the exact sqrt(beta)*score for
    x0 ~ N(M0, diag(V0)) under the SGM kernel."""

    def a_exact(params, y, t):
        tc = t.reshape(-1, 1)
        alpha = sde.mean_weight(tc)
        var = alpha**2 * V0 + sde.var(tc)
        score = -(y - alpha * M0) / var
        return jnp.sqrt(sde.beta(tc)) * score

    return PluginReverseSDE.create(sde, a_exact, {})


@pytest.fixture(scope="module")
def gen():
    return _exact_gauss_gen(SGMSde.create(num_steps_forward=16))


def test_logsnr_grid_monotone_and_pinned(gen):
    s = np.asarray(_grid(gen.base_sde, 32, jnp.float32))
    assert s.shape == (33,)
    assert np.all(np.diff(s) < 0)  # strictly decreasing T -> t_eps
    np.testing.assert_allclose(s[0], float(gen.base_sde.T), rtol=1e-6)
    np.testing.assert_allclose(s[-1], float(gen.base_sde.t_epsilon), rtol=1e-6)


@pytest.mark.parametrize("method,steps", [("dpm1", 64), ("dpm2", 16),
                                          ("dpm2m", 16), ("dpm3m", 16)])
def test_transports_latents_to_data_law(gen, method, steps):
    key = jax.random.PRNGKey(0)
    x0 = gen.latent_sample(key, 20_000, 2)
    x = jax.jit(
        lambda x0: integrate_dpm(gen, x0, steps, method=method)
    )(x0)
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), np.asarray(M0),
                               atol=0.08)
    np.testing.assert_allclose(np.var(np.asarray(x), 0), np.asarray(V0),
                               rtol=0.12)


def test_convergence_orders(gen):
    """All dpm paths approximate the same ODE solution map as the generic
    RK4 PF-ODE integrator, at their design order: halving the λ-step
    halves dpm1's error (order 1) and quarters dpm2/dpm2m's (order 2).
    This pins both the solution map (shared exact limit) and the
    exponential-integrator coefficients (the order would degrade to 1 if
    e.g. the expm1 factors or the 2M multistep correction were wrong)."""
    x0 = gen.latent_sample(jax.random.PRNGKey(1), 512, 2)
    x_star = integrate_ode(gen, x0, 2048, method="rk4")

    def errs(method, steps):
        return [
            float(jnp.max(jnp.linalg.norm(
                integrate_dpm(gen, x0, n, method=method) - x_star, axis=-1)))
            for n in steps
        ]

    e1 = errs("dpm1", (16, 32, 64))
    for a, b in zip(e1, e1[1:]):
        assert 1.6 < a / b < 2.6, e1
    for method in ("dpm2", "dpm2m"):
        e2 = errs(method, (16, 32, 64))
        for a, b in zip(e2, e2[1:]):
            assert 3.0 < a / b < 5.5, (method, e2)
        assert e2[-1] < 0.03, (method, e2)


def test_higher_order_beats_dpm1_at_equal_nfe(gen):
    """At a matched score-eval budget (NFE=16) both 2nd-order solvers
    should land closer to the exact ODE endpoint than first-order."""
    x0 = gen.latent_sample(jax.random.PRNGKey(2), 1024, 2)
    x_star = integrate_ode(gen, x0, 512, method="rk4")

    def err(x):
        return float(jnp.mean(jnp.linalg.norm(x - x_star, axis=-1)))

    e1 = err(integrate_dpm(gen, x0, 16, method="dpm1"))
    e2 = err(integrate_dpm(gen, x0, 8, method="dpm2"))
    e2m = err(integrate_dpm(gen, x0, 16, method="dpm2m"))
    assert e2 < e1, (e1, e2)
    assert e2m < e1, (e1, e2m)


def test_dpm3m_beats_dpm2m_at_equal_nfe(gen):
    """The 3rd-order multistep must strictly improve on 2M at every
    matched budget (both are 1 NFE/step), and its step-halving ratio on
    the coarse end must exceed 2nd order's ~4 (measured 8.7 at 8→16;
    the fine-step tail relaxes toward ~4.7 as the fp32 λ-interp floor
    and the order-1/2 warm-up intervals start to dominate)."""
    x0 = gen.latent_sample(jax.random.PRNGKey(7), 512, 2)
    x_star = integrate_ode(gen, x0, 2048, method="rk4")

    def err(method, n):
        return float(jnp.max(jnp.linalg.norm(
            integrate_dpm(gen, x0, n, method=method) - x_star, axis=-1)))

    for n in (16, 32, 64):
        e2, e3 = err("dpm2m", n), err("dpm3m", n)
        assert e3 < e2, (n, e2, e3)
    assert err("dpm3m", 8) / err("dpm3m", 16) > 4.5


def test_trajectory_capture_shapes(gen):
    x0 = gen.latent_sample(jax.random.PRNGKey(3), 32, 2)
    traj = integrate_dpm(gen, x0, 8, method="dpm2m", keep_all=True)
    assert traj.shape == (8, 32, 2)
    traj = integrate_dpm(gen, x0, 8, method="dpm2m", keep_all=True,
                         include_t0=True)
    assert traj.shape == (9, 32, 2)
    np.testing.assert_array_equal(np.asarray(traj[0]), np.asarray(x0))


def test_time_grid_variant_runs(gen):
    x0 = gen.latent_sample(jax.random.PRNGKey(4), 256, 2)
    x = integrate_dpm(gen, x0, 16, method="dpm2m", grid="time")
    assert bool(jnp.all(jnp.isfinite(x)))


def test_karras_grid_follows_rho_schedule(gen):
    """The karras grid must be monotone, endpoint-pinned, and place its
    knots so the EDM noise scale σ_edm = e^{−λ} is affine in index after
    the ρ-th root (Karras et al. 2022 eq. 5) — i.e. the construction, not
    just 'some grid'."""
    sde = gen.base_sde
    s = np.asarray(_grid(sde, 32, jnp.float64 if jax.config.jax_enable_x64
                         else jnp.float32, grid="karras"))
    assert s.shape == (33,)
    assert np.all(np.diff(s) < 0)
    np.testing.assert_allclose(s[0], float(sde.T), rtol=1e-6)
    np.testing.assert_allclose(s[-1], float(sde.t_epsilon), rtol=1e-6)
    alpha = np.asarray(sde.mean_weight(jnp.asarray(s)))
    sig_edm = np.sqrt(np.asarray(sde.var(jnp.asarray(s)))) / alpha
    root = sig_edm ** (1.0 / 7.0)
    # affine in index: second differences vanish (interp tolerance)
    np.testing.assert_allclose(np.diff(root, 2), 0.0, atol=2e-3)
    # and it differs from the uniform-λ grid
    s_log = np.asarray(_grid(sde, 32, jnp.float32))
    assert np.max(np.abs(s - s_log)) > 1e-3


def test_karras_grid_transports(gen):
    """32 steps: the ρ-schedule clusters knots at LOW noise, so on this
    broad-Gaussian oracle (no sharp manifold to resolve) its error
    constant at a given step count is a bit larger than uniform-λ's —
    measured var err 14% at 16 steps, 5% at 32 (logsnr: 6%/3%)."""
    key = jax.random.PRNGKey(11)
    x0 = gen.latent_sample(key, 20_000, 2)
    x = jax.jit(
        lambda x0: integrate_dpm(gen, x0, 32, method="dpm2m", grid="karras")
    )(x0)
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), np.asarray(M0),
                               atol=0.08)
    np.testing.assert_allclose(np.var(np.asarray(x), 0), np.asarray(V0),
                               rtol=0.12)


def test_msgm_rejected():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 8))
    msgm = MSGMSde.create(key, x, dense_tensor=True)
    gen = PluginReverseSDE.create(msgm, lambda p, y, t: y, {})
    with pytest.raises(ValueError, match="closed-form"):
        integrate_dpm(gen, x, 4)


def test_bad_method_and_grid_rejected(gen):
    x0 = jnp.zeros((4, 2))
    with pytest.raises(ValueError, match="dpm1"):
        integrate_dpm(gen, x0, 4, method="rk4")
    with pytest.raises(ValueError, match="grid"):
        integrate_dpm(gen, x0, 4, grid="quadratic")


def test_nfe_accounting():
    assert nfe("dpm1", 16) == 16
    assert nfe("dpm2", 16) == 32
    assert nfe("dpm2m", 16) == 16
    assert nfe("sdpm1", 16) == 16


def test_sdpm1_transports_latents_to_data_law(gen):
    """Stochastic exponential integrator: the exact OU part + exact
    conditional noise variance must transport N(0, I) to the data law."""
    key = jax.random.PRNGKey(6)
    x0 = gen.latent_sample(key, 20_000, 2)
    x = jax.jit(
        lambda x0: integrate_dpm(gen, x0, 16, method="sdpm1",
                                 key=jax.random.fold_in(key, 1))
    )(x0)
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), np.asarray(M0),
                               atol=0.08)
    np.testing.assert_allclose(np.var(np.asarray(x), 0), np.asarray(V0),
                               rtol=0.12)


def test_sdpm2m_transports_at_few_steps(gen):
    """The 2nd-order multistep stochastic solver must stay accurate at
    step counts where sdpm1's frozen-ε̂ error blows the variance up
    (measured: var ~9.4 vs target 1.8 at 8 steps)."""
    key = jax.random.PRNGKey(10)
    x0 = gen.latent_sample(key, 20_000, 2)
    x = jax.jit(
        lambda x0: integrate_dpm(gen, x0, 8, method="sdpm2m",
                                 key=jax.random.fold_in(key, 1))
    )(x0)
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), np.asarray(M0),
                               atol=0.08)
    np.testing.assert_allclose(np.var(np.asarray(x), 0), np.asarray(V0),
                               rtol=0.12)


def test_sdpm1_key_semantics(gen):
    x0 = gen.latent_sample(jax.random.PRNGKey(7), 128, 2)
    k = jax.random.PRNGKey(8)
    a = integrate_dpm(gen, x0, 8, method="sdpm1", key=k)
    b = integrate_dpm(gen, x0, 8, method="sdpm1", key=k)
    c = integrate_dpm(gen, x0, 8, method="sdpm1",
                      key=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    with pytest.raises(ValueError, match="stochastic"):
        integrate_dpm(gen, x0, 8, method="sdpm1")


def test_cli_rejects_dpm_method_without_dpm_sampler():
    """dpm*/sdpm1 --backward-method without --sampler dpm must fail at
    parse time, not with a KeyError after training (review finding)."""
    import sdeflow_tpu.run as R

    for method in ("dpm2m", "sdpm1"):
        with pytest.raises(SystemExit):
            R.main(["--preset", "swissroll_dbg", "--cpu",
                    "--backward-method", method])
    # --dpm-grid is a dpm-sampler knob: reject it under the default sampler
    with pytest.raises(SystemExit):
        R.main(["--preset", "swissroll_dbg", "--cpu",
                "--dpm-grid", "karras"])


def test_combo_helper_dispatch(gen):
    """tools/sampler_combos: parsing + every combo's solve runs (the
    single wiring point the parity tools share)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.sampler_combos import SGM_ONLY, make_solve, parse_combos

    assert parse_combos(None, 64) == [("sde", 64)]
    combos = parse_combos("sde:4,ode:2,pc:2,dpm:2,sdpm:2,sdpm2:2", 64)
    assert combos == [("sde", 4), ("ode", 2), ("pc", 2), ("dpm", 2),
                      ("sdpm", 2), ("sdpm2", 2)]
    z = gen.latent_sample(jax.random.PRNGKey(0), 16, 2)
    k = jax.random.PRNGKey(1)
    for samp, steps in combos:
        assert (samp in SGM_ONLY) == (samp in ("dpm", "sdpm", "sdpm2"))
        out = make_solve(samp, steps, is_msgm=False)(gen, z, k)
        assert out.shape == (16, 2) and bool(jnp.all(jnp.isfinite(out)))


def test_serving_dispatch(gen):
    from sdeflow_tpu.serving import make_sampler_fn

    fn = jax.jit(make_sampler_fn(gen, 128, 2, 8, method="dpm2m",
                                 sampler="dpm"))
    x = fn(jax.random.PRNGKey(5))
    assert x.shape == (128, 2) and bool(jnp.all(jnp.isfinite(x)))
    # non-dpm method names fall back to the dpm2m default under sampler="dpm"
    fn2 = jax.jit(make_sampler_fn(gen, 128, 2, 8, method="rk4",
                                  sampler="dpm"))
    np.testing.assert_array_equal(np.asarray(fn2(jax.random.PRNGKey(5))),
                                  np.asarray(x))
    # stochastic variant routes the solve key through
    fn3 = jax.jit(make_sampler_fn(gen, 128, 2, 8, method="sdpm1",
                                  sampler="dpm"))
    y = fn3(jax.random.PRNGKey(5))
    assert y.shape == (128, 2) and bool(jnp.all(jnp.isfinite(y)))
    assert not np.allclose(np.asarray(y), np.asarray(x))
    # the grid knob reaches the solver (karras ≠ logsnr trajectories)
    fn4 = jax.jit(make_sampler_fn(gen, 128, 2, 8, method="dpm2m",
                                  sampler="dpm", dpm_grid="karras"))
    z = fn4(jax.random.PRNGKey(5))
    assert z.shape == (128, 2) and bool(jnp.all(jnp.isfinite(z)))
    assert not np.allclose(np.asarray(z), np.asarray(x))
