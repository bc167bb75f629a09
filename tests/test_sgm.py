"""SGM (VP-SDE) analytics: closed-form moments vs numeric integration.

Oracle (a): the closed-form mean_weight/var (reference SDEs.py:177-181) must
match the forward integrator's empirical moments (SURVEY.md §4 test plan).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdeflow_tpu.sde.sgm import SGMSde
from sdeflow_tpu.sde.forward import ForwardFlow
from sdeflow_tpu.ops.integrators import integrate_sde


def test_vp_moment_formulas():
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0)
    t = jnp.asarray([0.0, 0.25, 1.0])
    mw = sde.mean_weight(t)
    var = sde.var(t)
    # closed forms from Song et al. eq (33)
    d = 20.0 - 0.1
    mw_np = np.exp(-0.25 * np.asarray(t) ** 2 * d - 0.5 * np.asarray(t) * 0.1)
    var_np = 1 - np.exp(-0.5 * np.asarray(t) ** 2 * d - np.asarray(t) * 0.1)
    assert np.allclose(np.asarray(mw), mw_np, rtol=1e-6)
    assert np.allclose(np.asarray(var), var_np, rtol=1e-6)
    # variance preserving: var(T) ≈ 1, mean_weight(T) ≈ 0
    assert float(var[-1]) > 0.99
    assert float(mw[-1]) < 0.01


def test_closed_form_matches_integrator(rng):
    """Empirical mean/var of the RK4 forward solve equals the analytic VP
    kernel at t = T."""
    sde = SGMSde.create(beta_min=0.1, beta_max=4.0, num_steps_forward=128)
    n = 100_000
    x0 = jnp.full((n, 2), 1.5)
    flow = ForwardFlow(base_sde=sde, T=sde.T)
    xT = jax.jit(lambda k: integrate_sde(flow, x0, k, 128, method="rk4"))(rng)
    t1 = jnp.ones(())
    mean_th = float(sde.mean_weight(t1)) * 1.5
    var_th = float(sde.var(t1))
    assert abs(float(jnp.mean(xT)) - mean_th) < 0.02
    assert abs(float(jnp.var(xT)) - var_th) < 0.02


def test_sample_song_et_al_moments(rng):
    sde = SGMSde.create()
    x0 = jnp.full((200_000, 2), 0.7)
    t = jnp.full((200_000,), 0.5)
    yt = sde.sample(rng, t, x0)
    mw = float(sde.mean_weight(jnp.asarray(0.5)))
    var = float(sde.var(jnp.asarray(0.5)))
    assert abs(float(jnp.mean(yt)) - mw * 0.7) < 5e-3
    assert abs(float(jnp.var(yt)) - var) < 5e-3


def test_latent_and_logpdf(rng):
    sde = SGMSde.create()
    z = sde.latent_sample(rng, 50_000, 4)
    assert z.shape == (50_000, 4)
    assert abs(float(jnp.mean(z))) < 0.02
    assert abs(float(jnp.var(z)) - 1.0) < 0.02
    lp = sde.log_latent_pdf(jnp.zeros((3, 4)))
    assert lp.shape == (3, 4)
    # standard normal at 0 with the reference's eps smoothing
    assert np.allclose(np.asarray(lp), -0.5 * np.log(2 * np.pi), atol=1e-5)


def test_cond_latent_sample_is_forward_kernel_at_T(rng):
    sde = SGMSde.create()
    x = jnp.full((100_000, 2), 3.0)
    yT = sde.cond_latent_sample(rng, jnp.zeros((100_000,)), x)
    # at t = T the kernel is ~ N(mw(T)·x, var(T)) ≈ N(0, 1)
    assert abs(float(jnp.mean(yT))) < 0.02
    assert abs(float(jnp.var(yT)) - float(sde.var(sde.T))) < 0.02
