"""SSM loss correctness: Hutchinson vs exact divergence, gradient flow.

Oracle (e) of SURVEY.md §4: on small d the Hutchinson estimate
E_v[vᵀJv + ½‖a‖²] must equal div(mu_to_div) + ½‖a‖² computed with an exact
Jacobian trace.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.sde.sgm import SGMSde
from sdeflow_tpu.sde.msgm import MSGMSde
from sdeflow_tpu.sde.reverse import PluginReverseSDE
from sdeflow_tpu.models import MLP


def _mk_gen(rng, sde_kind="sgm", d=2, vtype="rademacher", ssm_intT=False):
    k_model, k_data, k_sde = jax.random.split(rng, 3)
    model = MLP(input_dim=d)
    x0 = jax.random.normal(k_data, (128, d))
    variables = model.init(k_model, x0, jnp.zeros((128,)))
    if sde_kind == "sgm":
        sde = SGMSde.create(num_steps_forward=16)
    else:
        sde = MSGMSde.create(k_sde, x0, num_steps_forward=16)
    gen = PluginReverseSDE.create(
        sde, model.apply, variables, vtype=vtype, ssm_intT=ssm_intT
    )
    return gen, x0


def _exact_div_loss(gen, t, y):
    """Exact tr(∂mu_to_div/∂y) + ½‖a‖² via full Jacobian (small d only)."""

    def field_single(yi, ti):
        yv = yi[None]
        tv = ti[None]
        a = gen.score(yv, tv)
        ga = gen.base_sde.sigma_apply(tv, yv, a)
        mu = ga - gen.base_sde.f(tv, yv) + 0.5 * gen.base_sde.div_sigma(tv, yv)
        return mu[0]

    def one(yi, ti):
        jac = jax.jacrev(lambda yy: field_single(yy, ti))(yi)
        a = gen.score(yi[None], ti[None])[0]
        return jnp.trace(jac) + 0.5 * jnp.sum(a**2)

    return jax.vmap(one)(y, t)


@pytest.mark.parametrize("sde_kind", ["sgm", "msgm"])
def test_hutchinson_matches_exact_divergence(rng, sde_kind):
    d = 3
    gen, x0 = _mk_gen(rng, sde_kind, d=d)
    key_t, key_y = jax.random.split(jax.random.fold_in(rng, 1))
    t = gen.sample_t(key_t, 64)
    y = gen.base_sde.sample(key_y, t, x0[:64])
    exact = _exact_div_loss(gen, t, y)
    # average the Hutchinson estimate over many probes
    keys = jax.random.split(jax.random.fold_in(rng, 2), 800)
    est = jnp.stack([gen.ssm_loss(k, t, x0[:64], y) for k in keys[:50]]).mean(0)
    # rademacher probes: exact in expectation; 50 probes → tight tolerance
    assert np.allclose(np.asarray(est), np.asarray(exact), rtol=0.15, atol=0.3)


def test_ssm_gradients_flow(rng):
    gen, x0 = _mk_gen(rng, "sgm")

    def loss(params):
        return gen.replace(a_params=params).ssm(jax.random.fold_in(rng, 3), x0).mean()

    g = jax.grad(loss)(gen.a_params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_ssm_intT_shapes(rng):
    d = 2
    gen, x0 = _mk_gen(rng, "msgm", d=d, ssm_intT=True)
    batch = 8
    loss = gen.ssm(jax.random.fold_in(rng, 4), x0[:batch])
    # grid has num_steps_forward=16 entries, none below t_eps=1e-3
    assert gen.intT_start == 0
    assert loss.shape == (16 * batch,)
    assert bool(jnp.isfinite(loss).all())


def test_intT_start_truncation():
    """With a large t_epsilon some grid points must be dropped statically."""
    sde = SGMSde.create(t_epsilon=0.2, num_steps_forward=10)
    model = MLP(input_dim=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)), jnp.zeros((1,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables, ssm_intT=True)
    assert gen.intT_start == 2  # grid 0.1, 0.2 are <= 0.2
    t = gen.t_linspace()
    assert t.shape == (8,)
    assert float(t[0]) > 0.2


def test_elbo_shapes(rng):
    gen, x0 = _mk_gen(rng, "sgm")
    elbo = gen.elbo_random_t_slice(jax.random.fold_in(rng, 5), x0[:32])
    assert elbo.shape == (32,)
    assert bool(jnp.isfinite(elbo).all())

    gen_m, x0m = _mk_gen(rng, "msgm")
    elbo_m = gen_m.elbo_random_t_slice(jax.random.fold_in(rng, 6), x0m[:32])
    assert elbo_m.shape == (32,)
    assert bool(jnp.isfinite(elbo_m).all())


def test_dsm_loss(rng):
    gen, x0 = _mk_gen(rng, "sgm")
    dsm = gen.dsm(jax.random.fold_in(rng, 7), x0[:32])
    assert dsm.shape == (32,)
    assert bool(jnp.isfinite(dsm).all())
    gen_m, x0m = _mk_gen(rng, "msgm")
    with pytest.raises(ValueError):
        gen_m.dsm(jax.random.fold_in(rng, 8), x0m[:32])


def test_eps_parameterization(rng):
    """parameterization="eps": score() = -(g/std)·net, so every consumer
    (losses, samplers, NLL) sees the same a ≈ gᵀ∇log q object either way —
    asserted via the exact algebraic identity against the direct
    parameterization of the same net, plus finiteness of the SSM/DSM
    losses and a reverse solve, plus the closed-form-kernel guard."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE

    x = jax.random.normal(rng, (32, 2))
    model = MLP(input_dim=2)
    variables = model.init(rng, x, jnp.zeros((32,)))
    sde = SGMSde.create(num_steps_forward=8)

    gen_eps = PluginReverseSDE.create(sde, model.apply, variables,
                                      parameterization="eps")
    gen_dir = PluginReverseSDE.create(sde, model.apply, variables)
    t = jnp.linspace(0.05, 0.9, 32)

    # identity: score_eps = -(g/std) * score_direct (same net output)
    g = jnp.sqrt(sde.beta(t.reshape(-1, 1)))
    std = jnp.sqrt(sde.var(t.reshape(-1, 1)))
    np.testing.assert_allclose(
        np.asarray(gen_eps.score(x, t)),
        np.asarray(-(g / std) * gen_dir.score(x, t)),
        rtol=1e-6,
    )

    # losses and sampling run finite through the rescaled drift
    assert bool(jnp.isfinite(gen_eps.ssm(rng, x)).all())
    assert bool(jnp.isfinite(gen_eps.dsm(rng, x)).all())
    from sdeflow_tpu.ops.integrators import integrate_sde

    out = jax.jit(
        lambda g_, z, k: integrate_sde(g_, z, k, 8, method="rk4")
    )(gen_eps, gen_eps.latent_sample(rng, 16, 2), rng)
    assert bool(jnp.isfinite(out).all())

    # closed-form kernel required: MSGM must be rejected
    import pytest

    msgm = MSGMSde.create(rng, x, num_steps_forward=8, dense_tensor=True)
    with pytest.raises(ValueError, match="closed-form"):
        PluginReverseSDE.create(msgm, model.apply, variables,
                                parameterization="eps")


def test_eps_parameterization_trains(rng):
    """An eps-parameterized SGM MLP trains to a sane swissroll fit: the
    SSM loss decreases and 128-step rk4 samples stay finite with √MMD in
    the trained band (beyond-reference knob; the reference always learns
    the direct output, SDEs.py:563-579)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.eval import compute_mmd
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import Trainer
    from sdeflow_tpu.ops.integrators import integrate_sde

    sampler = SwissRoll()
    model = MLP(input_dim=2)
    x0 = sampler.sample(rng, 256)
    variables = model.init(rng, x0, jnp.zeros((256,)))
    sde = SGMSde.create(num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables,
                                  parameterization="eps")
    trainer = Trainer(gen, sampler, lr=1e-3, batch_size=256,
                      print_every=10_000)
    state, final_loss = trainer.run(jax.random.fold_in(rng, 1), 3000)
    assert trainer.history[0]["loss"] > final_loss

    n = 4000
    z = state.gen_sde.latent_sample(jax.random.fold_in(rng, 2), n, 2)
    xgen = jax.jit(
        lambda g, k, z: integrate_sde(g, z, k, 128, method="rk4")
    )(state.gen_sde, jax.random.fold_in(rng, 3), z)
    xtest = sampler.sampletest(jax.random.fold_in(rng, 4), n)
    mmd = float(compute_mmd(xgen, xtest)) ** 0.5
    assert np.isfinite(mmd) and mmd < 0.15, mmd
