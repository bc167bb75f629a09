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


def test_sample_debiasing_t_matches_analytic_density(rng):
    """KS test: empirical CDF of sample_debiasing_t vs the analytic
    CDF of q(t) ∝ β(t)/var(t) on [t_ε, T] (reference stub SDEs.py:148-155,
    implemented closed-form here)."""
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=0.001)
    n = 200_000
    t = np.asarray(sde.sample_debiasing_t(rng, (n,)))
    assert t.min() >= 0.001 - 1e-7 and t.max() <= 1.0 + 1e-7

    def F(tt):  # CDF antiderivative log(expm1(B(t))) = B + log var
        B = 0.1 * tt + 0.5 * (20.0 - 0.1) * tt**2
        return B + np.log1p(-np.exp(-B))

    lo, hi = F(np.asarray(0.001)), F(np.asarray(1.0))
    cdf = (F(np.sort(t)) - lo) / (hi - lo)
    emp = np.arange(1, n + 1) / n
    assert np.max(np.abs(cdf - emp)) < 0.005  # KS distance

    # constant-β guard branch: a == 0 path
    sde_c = SGMSde.create(beta_min=2.0, beta_max=2.0, t_epsilon=0.001)
    tc = np.asarray(sde_c.sample_debiasing_t(rng, (50_000,)))
    assert tc.min() >= 0.001 - 1e-7 and tc.max() <= 1.0 + 1e-7
    # analytic CDF for constant β: F(t) = 2t + log var(t)
    Fc = lambda tt: 2.0 * tt + np.log1p(-np.exp(-2.0 * tt))
    cdfc = (Fc(np.sort(tc)) - Fc(0.001)) / (Fc(1.0) - Fc(0.001))
    assert np.max(np.abs(cdfc - np.arange(1, 50_001) / 50_000)) < 0.01


def test_dsm_debias_trains(rng):
    """dsm(debias=True) is trainable end to end on swissroll (VERDICT r3 #4:
    the knob used to crash at trace time)."""
    import optax
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import PluginReverseSDE
    from sdeflow_tpu.data.synthetic import SwissRoll

    model = MLP(input_dim=2, hidden_dim=32)
    x0 = jnp.zeros((8, 2))
    variables = model.init(rng, x0, jnp.zeros((8,)))
    sde = SGMSde.create()
    gen = PluginReverseSDE.create(sde, model.apply, variables, debias=True)
    tx = optax.adam(1e-3)
    opt_state = tx.init(gen.a_params)
    data = SwissRoll()

    @jax.jit
    def step(params, opt_state, k):
        kx, kl = jax.random.split(k)
        x = data.sample(kx, 256)
        loss_fn = lambda p: jnp.mean(gen.replace(a_params=p).dsm(kl, x))
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = gen.a_params
    losses = []
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_debias_rejected_without_closed_form_kernel(rng):
    """MSGM has no closed-form kernel: debias=True must fail at create()."""
    import pytest
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE
    from sdeflow_tpu.models import MLP

    x_data = jax.random.normal(rng, (256, 4))
    sde = MSGMSde.create(rng, x_data)
    model = MLP(input_dim=4, hidden_dim=8)
    variables = model.init(rng, jnp.zeros((2, 4)), jnp.zeros((2,)))
    with pytest.raises(ValueError, match="debias"):
        PluginReverseSDE.create(sde, model.apply, variables, debias=True)


def test_cond_latent_sample_is_forward_kernel_at_T(rng):
    sde = SGMSde.create()
    x = jnp.full((100_000, 2), 3.0)
    yT = sde.cond_latent_sample(rng, jnp.zeros((100_000,)), x)
    # at t = T the kernel is ~ N(mw(T)·x, var(T)) ≈ N(0, 1)
    assert abs(float(jnp.mean(yT))) < 0.02
    assert abs(float(jnp.var(yT)) - float(sde.var(sde.T))) < 0.02
