"""Probability-flow ODE sampling + exact likelihood.

Oracle: for VP-SGM on Gaussian data N(0, Σ0) the time-t marginal is the
Gaussian N(0, m_t²Σ0 + v_t I) with closed-form score, so an ANALYTIC
score drift a(y,t) = g(t)·∇log p_t(y) makes the whole generative model
exact. Then:
  - `exact_logp` must reproduce log N(x; 0, Σ0),
  - the reverse PF-ODE must transport N(0, I) latents to N(0, Σ0),
  - encode→decode through the ODE must be the identity.
These close over the full pipeline (drift algebra, scan integration,
divergence accumulation, latent prior) with no training in the loop.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdeflow_tpu.sde.sgm import SGMSde
from sdeflow_tpu.sde.msgm import MSGMSde
from sdeflow_tpu.sde.reverse import PluginReverseSDE
from sdeflow_tpu.ops.ode import integrate_ode
from sdeflow_tpu.eval.nll import exact_logp, nll_bits_per_dim
from sdeflow_tpu.models import MLP

D = 3
EIGVALS = jnp.asarray([0.5, 1.0, 2.0])


def _rotation():
    # fixed orthogonal basis (QR of a deterministic matrix)
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(7), (D, D)))
    return q


def _analytic_gen(t_epsilon=1e-4):
    """PluginReverseSDE whose `a` is the exact score of N(0, Σ0) data."""
    sde = SGMSde.create(t_epsilon=t_epsilon, num_steps_forward=16)
    q = _rotation()

    def a_apply(params, y, t):
        lam = params  # (D,) eigenvalues of Σ0
        t = t.reshape(-1, 1)
        m2 = sde.mean_weight(t) ** 2
        v = sde.var(t)
        # ∇log p_t(y) = −(m²Σ0 + vI)^{-1} y, diagonal in the q basis
        inv = 1.0 / (m2 * lam[None, :] + v)  # (B, D)
        score = -(y @ q) * inv @ q.T
        return jnp.sqrt(sde.beta(t)) * score

    gen = PluginReverseSDE.create(sde, a_apply, EIGVALS)
    cov0 = q @ jnp.diag(EIGVALS) @ q.T
    return gen, cov0


def _log_gauss(x, cov):
    d = x.shape[-1]
    inv = jnp.linalg.inv(cov)
    _, logdet = jnp.linalg.slogdet(cov)
    quad = jnp.einsum("bi,ij,bj->b", x, inv, x)
    return -0.5 * (quad + logdet + d * jnp.log(2 * jnp.pi))


def _sample_data(key, cov, n):
    chol = jnp.linalg.cholesky(cov)
    return jax.random.normal(key, (n, D)) @ chol.T


# -- drift algebra -------------------------------------------------------------


def test_mu_ode_is_lambda1_drift_for_sgm(rng):
    gen, _ = _analytic_gen()
    y = jax.random.normal(rng, (32, D))
    t = jnp.full((32,), 0.3)
    np.testing.assert_allclose(
        gen.mu_ode(t, y), gen.mu(t, y, lmbd=1.0), rtol=1e-6
    )


def test_mu_ode_msgm_is_half_ga(rng):
    k_model, k_data, k_sde = jax.random.split(rng, 3)
    x0 = jax.random.normal(k_data, (64, 4))
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8)
    model = MLP(input_dim=4)
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    y = x0[:16]
    t = jnp.full((16,), 0.4)
    # ∇·Σ = 2f for MSGM, so ½ga − f + ½∇·Σ = ½ga (up to the fp32
    # rounding of the −f + ½·2f cancellation)
    np.testing.assert_allclose(
        gen.mu_ode(t, y), 0.5 * gen.ga(gen.T - t, y), rtol=1e-3, atol=1e-5
    )


# -- exact likelihood ----------------------------------------------------------


def test_exact_logp_matches_gaussian_closed_form(rng):
    gen, cov0 = _analytic_gen()
    x = _sample_data(rng, cov0, 64)
    logp = jax.jit(
        lambda xx: exact_logp(gen, xx, num_steps=128, divergence="exact")
    )(x)
    truth = _log_gauss(x, cov0)
    np.testing.assert_allclose(logp, truth, atol=2e-3, rtol=0)


def test_hutchinson_logp_matches_exact(rng):
    gen, cov0 = _analytic_gen()
    k_data, k_probe = jax.random.split(rng)
    x = _sample_data(k_data, cov0, 128)
    exact = exact_logp(gen, x, num_steps=64, divergence="exact")
    est = exact_logp(
        gen, x, k_probe, num_steps=64, divergence="hutchinson",
        vtype="rademacher", n_probes=8,
    )
    # unbiased estimator: batch means agree well before per-sample values do
    assert abs(float(est.mean() - exact.mean())) < 0.05
    np.testing.assert_allclose(est, exact, atol=0.6)


def test_nll_bits_per_dim_unit(rng):
    gen, cov0 = _analytic_gen()
    x = _sample_data(rng, cov0, 16)
    logp = exact_logp(gen, x, num_steps=64, divergence="exact")
    bpd = nll_bits_per_dim(gen, x, num_steps=64, divergence="exact")
    np.testing.assert_allclose(bpd, -logp / (D * np.log(2.0)), rtol=1e-6)


# -- ODE sampling --------------------------------------------------------------


def test_ode_sampler_reproduces_data_law(rng):
    gen, cov0 = _analytic_gen()
    x0 = gen.latent_sample(rng, 8192, D)
    for method, steps in (("rk4", 128), ("heun", 256)):
        x = integrate_ode(gen, x0, steps, method=method)
        emp = jnp.cov(x.T)
        np.testing.assert_allclose(emp, cov0, atol=0.12)
        np.testing.assert_allclose(x.mean(0), jnp.zeros(D), atol=0.05)


def test_ode_sampler_deterministic_and_trajectory(rng):
    gen, _ = _analytic_gen()
    x0 = gen.latent_sample(rng, 8, D)
    a = integrate_ode(gen, x0, 32)
    b = integrate_ode(gen, x0, 32)
    np.testing.assert_array_equal(a, b)
    traj = integrate_ode(gen, x0, 32, keep_all=True, include_t0=True)
    assert traj.shape == (33, 8, D)
    np.testing.assert_array_equal(traj[0], x0)
    np.testing.assert_array_equal(traj[-1], a)


def test_ode_encode_decode_roundtrip(rng):
    """The PF-ODE is an invertible flow: data → latent (likelihood solve)
    → data (reverse sampler) must be the identity up to integration error
    and the untrained [0, t_epsilon) gap."""
    gen, cov0 = _analytic_gen(t_epsilon=1e-4)
    x = _sample_data(rng, cov0, 32)
    _, y_T = exact_logp(
        gen, x, num_steps=256, divergence="exact", return_latent=True
    )
    x_rec = integrate_ode(gen, y_T, 256, method="rk4")
    np.testing.assert_allclose(x_rec, x, atol=5e-3, rtol=0)


def test_msgm_ode_norm_correction(rng):
    k_model, k_data, k_sde, k_lat = jax.random.split(rng, 4)
    x0 = jax.random.normal(k_data, (64, 4)) * 2.0
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8)
    model = MLP(input_dim=4, premodule="NormalizeLogRadius")
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    lat = gen.latent_sample(k_lat, 32, 4)
    x = integrate_ode(gen, lat, 16, norm_correction=True)
    assert bool(jnp.all(jnp.isfinite(x)))
    # exact PF-ODE drift is ⊥ y; the re-projection pins the radii exactly
    np.testing.assert_allclose(
        jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(lat, axis=-1), rtol=1e-5
    )


def test_serving_ode_sampler(rng):
    from sdeflow_tpu.serving import make_sampler_fn

    gen, _ = _analytic_gen()
    fn = jax.jit(make_sampler_fn(gen, 16, D, 32, sampler="ode"))
    a = fn(rng)
    b = fn(rng)
    np.testing.assert_array_equal(a, b)
    c = fn(jax.random.PRNGKey(123))
    assert not np.allclose(a, c)


# -- adaptive (Dormand–Prince) path --------------------------------------------


def test_dopri_matches_fixed_step_endpoint(rng):
    """The adaptive solve approximates the same ODE solution map as the
    dense fixed-step rk4 reference, under jit (one while_loop program)."""
    gen, _ = _analytic_gen()
    x0 = gen.latent_sample(rng, 512, D)
    x_star = integrate_ode(gen, x0, 2048, method="rk4")
    x = jax.jit(lambda z: integrate_ode(gen, z, 8, method="dopri"))(x0)
    err = float(jnp.max(jnp.linalg.norm(x - x_star, axis=-1)))
    assert err < 0.05, err  # fp32 + stiff tail near s=T bound the floor
    # deterministic
    np.testing.assert_array_equal(
        x, jax.jit(lambda z: integrate_ode(gen, z, 8, method="dopri"))(x0)
    )


def test_dopri_trajectory_capture(rng):
    gen, _ = _analytic_gen()
    x0 = gen.latent_sample(rng, 8, D)
    traj = integrate_ode(gen, x0, 16, method="dopri", keep_all=True,
                         include_t0=True)
    assert traj.shape == (17, 8, D)
    np.testing.assert_array_equal(traj[0], x0)
    traj2 = integrate_ode(gen, x0, 16, method="dopri", keep_all=True)
    assert traj2.shape == (16, 8, D)
    np.testing.assert_allclose(traj[-1], traj2[-1], rtol=1e-6)


def test_dopri_msgm_norms_and_serving(rng):
    """dopri serves MSGM (no closed-form kernel needed): finite samples,
    radii restored exactly by the a-posteriori projection; reachable
    through the serving dispatch (sampler='ode', method='dopri')."""
    from sdeflow_tpu.serving import make_sampler_fn

    k_model, k_data, k_sde, k_lat = jax.random.split(rng, 4)
    x0 = jax.random.normal(k_data, (64, 4)) * 2.0
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8)
    model = MLP(input_dim=4, premodule="NormalizeLogRadius")
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    lat = gen.latent_sample(k_lat, 32, 4)
    x = integrate_ode(gen, lat, 8, method="dopri", norm_correction=True)
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(
        jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(lat, axis=-1), rtol=1e-5
    )
    fn = jax.jit(make_sampler_fn(gen, 16, 4, 8, method="dopri",
                                 sampler="ode", norm_correction=True))
    y = fn(jax.random.PRNGKey(3))
    assert y.shape == (16, 4) and bool(jnp.all(jnp.isfinite(y)))


def test_cli_rejects_dopri_without_ode_sampler():
    import pytest

    import sdeflow_tpu.run as R

    with pytest.raises(SystemExit):
        R.main(["--preset", "swissroll_dbg", "--cpu",
                "--backward-method", "dopri"])


def test_dopri_exact_logp_matches_closed_form(rng):
    """The adaptive likelihood solve (Song et al. 2021 §D.2's RK45 path)
    over the augmented (y, ℓ) pytree state: tighter than fixed-step-128
    at default tolerances (measured max err ~1e-4 vs the 2e-3 budget)."""
    gen, cov0 = _analytic_gen()
    x = _sample_data(rng, cov0, 64)
    truth = _log_gauss(x, cov0)
    lp = jax.jit(
        lambda xx: exact_logp(gen, xx, method="dopri", divergence="exact")
    )(x)
    np.testing.assert_allclose(lp, truth, atol=5e-4, rtol=0)
    # hutchinson + latent round trip stay wired through the same branch
    lp2, y_T = exact_logp(gen, x, method="dopri", divergence="exact",
                          return_latent=True)
    np.testing.assert_allclose(lp, lp2, rtol=1e-6)
    assert y_T.shape == x.shape


# -- encode (deterministic inversion) -------------------------------------------


def test_encode_ode_inverts_decode(rng):
    """encode_ode is the exact inverse of integrate_ode for ANY drift
    field (inversion needs no trained score — only time-mirroring)."""
    k_model, k_lat = jax.random.split(rng)
    model = MLP(input_dim=D)
    sde = SGMSde.create(t_epsilon=1e-4, num_steps_forward=16)
    variables = model.init(k_model, jnp.zeros((4, D)), jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    from sdeflow_tpu.ops.ode import encode_ode

    z = gen.latent_sample(k_lat, 32, D)
    x = integrate_ode(gen, z, 256, method="rk4")
    z_rec = encode_ode(gen, x, 256, method="rk4")
    np.testing.assert_allclose(z_rec, z, atol=5e-3, rtol=0)


def test_encode_ode_matches_likelihood_latent(rng):
    """Same transport as exact_logp's augmented solve, minus the
    divergence accumulation."""
    gen, cov0 = _analytic_gen(t_epsilon=1e-4)
    from sdeflow_tpu.ops.ode import encode_ode

    x = _sample_data(rng, cov0, 32)
    _, y_T = exact_logp(
        gen, x, num_steps=128, divergence="exact", return_latent=True
    )
    # exact_logp integrates [t_epsilon, T]; mirror it exactly via t0
    z = encode_ode(gen, x, 128, method="rk4",
                   t0=gen.base_sde.t_epsilon)
    np.testing.assert_allclose(z, y_T, atol=1e-4, rtol=0)
    # and the full round trip closes
    x_rec = integrate_ode(gen, z, 128, method="rk4")
    np.testing.assert_allclose(x_rec, x, atol=5e-3, rtol=0)


def test_encode_ode_dopri_roundtrip(rng):
    gen, cov0 = _analytic_gen(t_epsilon=1e-4)
    from sdeflow_tpu.ops.ode import encode_ode

    x = _sample_data(rng, cov0, 16)
    z = encode_ode(gen, x, 8, method="dopri")
    x_rec = integrate_ode(gen, z, 8, method="dopri")
    assert z.shape == x.shape and bool(jnp.isfinite(z).all())
    np.testing.assert_allclose(x_rec, x, atol=5e-3, rtol=0)


def test_encode_ode_msgm_norm_correction(rng):
    k_model, k_data, k_sde = jax.random.split(rng, 3)
    x0 = jax.random.normal(k_data, (64, 4)) * 2.0
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8)
    model = MLP(input_dim=4, premodule="NormalizeLogRadius")
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    from sdeflow_tpu.ops.ode import encode_ode

    x = x0[:16]
    z = encode_ode(gen, x, 32, norm_correction=True)
    # MSGM transport is radius-preserving; the projection pins it exactly
    np.testing.assert_allclose(
        jnp.linalg.norm(z, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-5
    )


# -- MSGM normalized likelihood --------------------------------------------------


def _msgm_gen_2d(rng, drift_scale=0.0):
    k_data, k_sde, k_model = jax.random.split(rng, 3)
    x0 = jax.random.normal(k_data, (512, 2)) * 1.5
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8, norm_map="log",
                         dense_tensor=True)
    model = MLP(input_dim=2)
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))

    def a_apply(params, y, t):
        return drift_scale * model.apply(params, y, t)

    return PluginReverseSDE.create(sde, a_apply, variables)


def _grid2d(lim, n):
    # offset by half a cell so r=0 (where log r diverges) is never hit
    xs = jnp.linspace(-lim, lim, n, endpoint=False) + lim / n
    gx, gy = jnp.meshgrid(xs, xs)
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    cell = (2.0 * lim / n) ** 2
    return pts, cell


def test_msgm_exact_prior_normalizes(rng):
    """log_latent_pdf_exact is a true density on R^d: it integrates to 1
    (the reference's log_latent_pdf admittedly does not, SDEs.py:504-505)."""
    gen = _msgm_gen_2d(rng)
    pts, cell = _grid2d(8.0, 400)
    mass = float(jnp.exp(gen.base_sde.log_latent_pdf_exact(pts)).sum() * cell)
    assert abs(mass - 1.0) < 0.02, mass


def test_msgm_exact_logp_integrates_to_one(rng):
    """Full-pipeline normalization: exact_logp with the normalized radial
    prior defines a probability density for the MSGM generative model —
    transport Jacobian, divergence sign, and prior all consistent."""
    gen = _msgm_gen_2d(rng, drift_scale=0.05)
    pts, cell = _grid2d(8.0, 96)
    logp = jax.jit(
        lambda xx: exact_logp(gen, xx, num_steps=24, divergence="exact")
    )(pts)
    mass = float(jnp.exp(logp).sum() * cell)
    assert abs(mass - 1.0) < 0.05, mass
    # the reference-faithful prior is NOT normalized — visibly so
    logp_ref = exact_logp(gen, pts[::4], num_steps=24, divergence="exact",
                          prior="model")
    assert bool(jnp.isfinite(logp_ref).all())


def test_sgm_prior_option_is_noop(rng):
    gen, cov0 = _analytic_gen()
    x = _sample_data(rng, cov0, 32)
    a = exact_logp(gen, x, num_steps=32, divergence="exact", prior="exact")
    b = exact_logp(gen, x, num_steps=32, divergence="exact", prior="model")
    np.testing.assert_array_equal(a, b)


def test_encode_ode_t0_matches_likelihood_at_coarse_eps(rng):
    """With a non-negligible t_epsilon the [0, t_epsilon) gap is visible:
    t0=t_epsilon reproduces exact_logp's latent, t0=0 measurably differs."""
    gen, cov0 = _analytic_gen(t_epsilon=5e-2)
    from sdeflow_tpu.ops.ode import encode_ode

    x = _sample_data(rng, cov0, 16)
    _, y_T = exact_logp(
        gen, x, num_steps=128, divergence="exact", return_latent=True
    )
    z_eps = encode_ode(gen, x, 128, t0=gen.base_sde.t_epsilon)
    np.testing.assert_allclose(z_eps, y_T, atol=1e-4, rtol=0)
    z_zero = encode_ode(gen, x, 128)
    assert float(jnp.abs(z_zero - y_T).max()) > 1e-3


def test_nll_summary_guards_divergence(rng):
    from sdeflow_tpu.eval.nll import nll_summary

    gen, cov0 = _analytic_gen()
    x = _sample_data(rng, cov0, 8)
    ok = nll_summary(gen, x, rng, num_steps=8)
    assert ok["n"] == 8 and np.isfinite(ok["mean"])
    bad = nll_summary(gen, jnp.full_like(x, jnp.nan), rng, num_steps=8)
    assert bad == {"mean": None, "stderr": None, "n": 0, "steps": 8}
    import json
    json.loads(json.dumps(bad))  # strict-JSON-serializable
