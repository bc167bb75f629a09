"""Predictor–corrector (preconditioned-Langevin) sampling.

Oracle: the same analytic-score construction as tests/test_ode.py — for
VP-SGM on N(0, Σ0) data the time-s marginal is N(0, m_s²Σ0 + v_s·I) with
closed-form score, so `a(y,t) = g·∇log p_t(y)` makes the corrector's
target distribution exactly known. The Langevin corrector
(ops/integrators.langevin_corrector) must then
  - leave the analytic marginal invariant / converge to it from a wrong
    initialization (it is an MCMC kernel for p_s),
  - improve a coarse predictor-only solve at equal predictor step count.
For MSGM the corrector direction g·a and its injected noise g·z are both
pointwise tangent (G skew-symmetric, reference SDEs.py:315-341), so with
norm re-projection the corrector preserves per-sample norms exactly.

No reference counterpart: the reference samples predictor-only
(sde_scheme.py:44-269); this is a quality-per-NFE lever the rebuild adds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.sde.sgm import SGMSde
from sdeflow_tpu.sde.msgm import MSGMSde
from sdeflow_tpu.sde.reverse import PluginReverseSDE
from sdeflow_tpu.ops.integrators import integrate_sde, langevin_corrector
from sdeflow_tpu.models import MLP

D = 3
EIGVALS = jnp.asarray([0.5, 1.0, 2.0])


def _rotation():
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(7), (D, D)))
    return q


def _analytic_gen(t_epsilon=1e-4):
    """PluginReverseSDE whose `a` is the exact score of the N(0, Σ0)
    data's forward marginals (same oracle as tests/test_ode.py)."""
    sde = SGMSde.create(t_epsilon=t_epsilon, num_steps_forward=16)
    q = _rotation()

    def a_apply(params, y, t):
        lam = params
        t = t.reshape(-1, 1)
        m2 = sde.mean_weight(t) ** 2
        v = sde.var(t)
        inv = 1.0 / (m2 * lam[None, :] + v)
        score = -(y @ q) * inv @ q.T
        return jnp.sqrt(sde.beta(t)) * score

    gen = PluginReverseSDE.create(sde, a_apply, EIGVALS)
    cov0 = q @ jnp.diag(EIGVALS) @ q.T
    return gen, cov0, q


def _marginal_cov(sde, cov0, s):
    m2 = float(sde.mean_weight(jnp.asarray(s))) ** 2
    v = float(sde.var(jnp.asarray(s)))
    return m2 * cov0 + v * jnp.eye(D)


# -- corrector as an MCMC kernel ----------------------------------------------


def test_corrector_converges_to_frozen_marginal(rng):
    """Many corrector steps at a frozen time transport a WRONG initial
    distribution onto the analytic marginal p_s (mean + covariance)."""
    gen, cov0, _ = _analytic_gen()
    s = 0.5  # forward time; reverse time t = T − s
    t_rev = float(gen.T) - s
    cov_s = _marginal_cov(gen.base_sde, cov0, s)

    k_init, k_corr = jax.random.split(rng)
    # deliberately wrong init: 3× too wide, mean-shifted
    x = 3.0 * jax.random.normal(k_init, (20_000, D)) + 1.5
    x = jax.jit(
        lambda x, k: langevin_corrector(gen, x, k, jnp.asarray(t_rev), 400)
    )(x, k_corr)

    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(np.asarray(jnp.mean(x, 0)),
                               np.zeros(D), atol=0.08)
    emp = np.cov(np.asarray(x).T)
    np.testing.assert_allclose(emp, np.asarray(cov_s), atol=0.12)


def test_corrector_leaves_marginal_invariant(rng):
    """Starting FROM p_s, corrector steps keep the covariance there."""
    gen, cov0, _ = _analytic_gen()
    s = 0.3
    t_rev = float(gen.T) - s
    cov_s = _marginal_cov(gen.base_sde, cov0, s)
    k_init, k_corr = jax.random.split(rng)
    chol = jnp.linalg.cholesky(cov_s)
    x = jax.random.normal(k_init, (20_000, D)) @ chol.T
    x2 = jax.jit(
        lambda x, k: langevin_corrector(gen, x, k, jnp.asarray(t_rev), 50)
    )(x, k_corr)
    emp = np.cov(np.asarray(x2).T)
    np.testing.assert_allclose(emp, np.asarray(cov_s), atol=0.1)


# -- predictor–corrector end to end -------------------------------------------


def test_pc_beats_coarse_predictor(rng):
    """At 6 EM predictor steps (far too coarse for this SDE), adding
    correctors must shrink the covariance error vs the data law."""
    gen, cov0, _ = _analytic_gen()
    k_lat, k1, k2 = jax.random.split(rng, 3)
    x0 = gen.latent_sample(k_lat, 20_000, D)

    def cov_err(x):
        return float(jnp.linalg.norm(jnp.asarray(np.cov(np.asarray(x).T))
                                     - cov0))

    x_p = jax.jit(lambda x, k: integrate_sde(gen, x, k, 6, method="em"))(
        x0, k1)
    x_pc = jax.jit(
        lambda x, k: integrate_sde(gen, x, k, 6, method="em",
                                   corrector_steps=10)
    )(x0, k2)
    e_p, e_pc = cov_err(x_p), cov_err(x_pc)
    assert e_pc < 0.5 * e_p, (e_p, e_pc)
    np.testing.assert_allclose(
        np.cov(np.asarray(x_pc).T), np.asarray(cov0), atol=0.25
    )


def test_pc_distinct_noise_from_predictor_only(rng):
    """corrector_steps>0 must consume a disjoint PRNG stream: the
    predictor-only result from the same key is unchanged relative to a
    plain integrate_sde call (the corrector must not perturb the
    predictor's per-step fold_in(key, i) draws)."""
    gen, _, _ = _analytic_gen()
    k_lat, k = jax.random.split(rng)
    x0 = gen.latent_sample(k_lat, 128, D)
    a = integrate_sde(gen, x0, k, 8, method="em")
    b = integrate_sde(gen, x0, k, 8, method="em", corrector_steps=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = integrate_sde(gen, x0, k, 8, method="em", corrector_steps=2)
    assert not np.allclose(np.asarray(a), np.asarray(c))


# -- MSGM: tangency + norm preservation ---------------------------------------


def test_msgm_corrector_directions_tangent(rng):
    """g·a and g·z are pointwise orthogonal to y (skew-symmetric G), so the
    corrector moves mass along the sphere — the geometry MSGM's transport
    noise is built on (reference SDEs.py:315-341)."""
    k_model, k_data, k_sde, k_z = jax.random.split(rng, 4)
    d = 8
    x0 = jax.random.normal(k_data, (256, d))
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8)
    model = MLP(input_dim=d)
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    y = x0[:64]
    t_rev = jnp.asarray(0.4)
    z = jax.random.normal(k_z, y.shape)
    gz = gen.corrector_noise(t_rev, y, z)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(y * gz, axis=-1)), 0.0, atol=1e-4
    )
    # drift = g·a + ∇·Σ: the score direction g·a is tangent; the ∇·Σ = 2f
    # part is deliberately RADIAL — it is the Itô compensator balancing the
    # tangent noise's outward drift (the same balance that conserves ‖y‖
    # in the forward SDE, reference SDEs.py:420-421)
    s = jnp.maximum(gen.T - t_rev, sde.t_epsilon)
    ga = gen.ga(s, y)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(y * ga, axis=-1)), 0.0, atol=1e-4
    )
    dirr = gen.corrector_drift(t_rev, y)
    np.testing.assert_allclose(
        np.asarray(dirr - ga), np.asarray(sde.div_sigma(s, y)), atol=1e-6
    )


def test_msgm_pc_norm_preserved(rng):
    """integrate_sde with correctors + norm_correction keeps per-sample
    norms bitwise at ‖x0‖ (the corrector re-projects too)."""
    k_model, k_data, k_sde, k_lat, k_run = jax.random.split(rng, 5)
    d = 8
    x0 = jax.random.normal(k_data, (256, d))
    sde = MSGMSde.create(k_sde, x0, num_steps_forward=8)
    model = MLP(input_dim=d)
    variables = model.init(k_model, x0[:4], jnp.zeros((4,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    lat = gen.latent_sample(k_lat, 128, d)
    out = jax.jit(
        lambda x, k: integrate_sde(gen, x, k, 8, method="rk4",
                                   norm_correction=True, corrector_steps=3)
    )(lat, k_run)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)),
        np.asarray(jnp.linalg.norm(lat, axis=-1)),
        rtol=1e-5,
    )


# -- plumbing -----------------------------------------------------------------


def test_serving_pc_sampler(rng):
    """make_sampler_fn(corrector_steps=...) builds a jittable PC program."""
    from sdeflow_tpu.serving import make_sampler_fn

    gen, cov0, _ = _analytic_gen()
    fn = jax.jit(make_sampler_fn(gen, 512, D, 8, method="em",
                                 corrector_steps=4))
    x = fn(rng)
    assert x.shape == (512, D)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_run_cli_corrector_plumbing(monkeypatch, tmp_path):
    """--corrector-steps/--snr land in the sweep config."""
    import sdeflow_tpu.run as R

    captured = {}

    class _FakeDriver:
        def __init__(self, cfg, make_plots=True, mesh=None):
            captured["cfg"] = cfg

        def run(self, key, **kw):
            return {}

    monkeypatch.setattr("sdeflow_tpu.experiments.driver.ExperimentDriver",
                        _FakeDriver)
    R.main(["--preset", "swissroll_dbg", "--cpu", "--corrector-steps", "3",
            "--snr", "0.2", "--no-plots",
            "--results-dir", str(tmp_path / "r")])
    assert captured["cfg"].sweep.corrector_steps == 3
    assert captured["cfg"].sweep.snr == pytest.approx(0.2)


def test_corrector_finite_on_zero_score(rng):
    """A (near-)zero corrector drift — e.g. any zero-init score head at
    init — must take no Langevin step, not blow eps up to inf and NaN
    every sample (review finding: the SNR step-size ratio divides by the
    drift norm)."""
    from sdeflow_tpu.ops.integrators import langevin_corrector
    from sdeflow_tpu.sde import PluginReverseSDE, SGMSde

    sde = SGMSde.create(num_steps_forward=4)
    gen = PluginReverseSDE.create(sde, lambda p, y, t: jnp.zeros_like(y), {})
    x = jax.random.normal(rng, (64, 2))
    out = langevin_corrector(gen, x, rng, jnp.asarray(0.5), 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
