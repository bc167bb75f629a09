"""MSGM: G-tensor invariants, norm conservation, radial latent prior.

Oracles (b), (c), (f) from SURVEY.md §4: skew-symmetry and tr(L_G) = −d/2
(reference SDEs.py:326, 328-339), norm conservation of the forward flow
(sde_scheme.py:85-86), and the ecdf latent sampler quantile round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.ops.gapply import (
    make_dense_G,
    dense_ito_tensor,
    dense_sigma_apply,
    circulant_sigma_apply,
    circulant_dense,
    CIRCULANT_COEF,
)
from sdeflow_tpu.ops.kde import gaussian_kde_logpdf, gaussian_kde_sample
from sdeflow_tpu.sde.msgm import MSGMSde


def test_dense_G_invariants(rng):
    d = 8
    G, L_G = make_dense_G(rng, d)
    # each slice skew-symmetric
    assert jnp.allclose(G, -jnp.transpose(G, (1, 0, 2)), atol=1e-6)
    # normalization invariant tr(L_G) = -d/2  =>  beta_G = 1
    assert abs(float(jnp.trace(L_G)) + d / 2) < 1e-4
    # L_G negative semi-definite
    eig = np.linalg.eigvalsh(np.asarray(L_G))
    assert (eig <= 1e-6).all()


def test_circulant_matches_dense_materialization(rng):
    d, B = 6, 5
    Gd = circulant_dense(d)
    # slices skew-symmetric, tr(L_G) = -d/2 without extra normalization
    assert jnp.allclose(Gd, -jnp.transpose(Gd, (1, 0, 2)), atol=1e-6)
    L = dense_ito_tensor(Gd)
    assert abs(float(jnp.trace(L)) + d / 2) < 1e-5
    # L_G = -1/2 I exactly for the circulant
    assert jnp.allclose(L, -0.5 * jnp.eye(d), atol=1e-5)
    # roll-stencil application == dense einsum application
    y = jax.random.normal(rng, (B, d))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (B, d))
    sb = jnp.asarray(1.7)
    out_roll = circulant_sigma_apply(sb, y, w)
    out_dense = dense_sigma_apply(Gd, sb, y, w)
    assert jnp.allclose(out_roll, out_dense, atol=1e-5)


def test_diffusion_action_is_norm_tangent(rng):
    """y · (g(y)·w) = 0: the multiplicative noise is tangent to the sphere,
    the structural reason the Stratonovich flow preserves ‖y‖."""
    d, B = 7, 4
    y = jax.random.normal(rng, (B, d))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (B, d))
    out = circulant_sigma_apply(jnp.asarray(1.0), y, w)
    assert jnp.allclose(jnp.sum(y * out, axis=1), 0.0, atol=1e-4)
    G, _ = make_dense_G(jax.random.fold_in(rng, 2), d)
    out_d = dense_sigma_apply(G, jnp.asarray(1.0), y, w)
    assert jnp.allclose(jnp.sum(y * out_d, axis=1), 0.0, atol=1e-4)


@pytest.mark.parametrize("dense_tensor", [True, False])
def test_forward_flow_preserves_norm(rng, dense_tensor):
    """The training-time perturbation is NOT norm-projected (matching the
    reference, SDEs.py:104-132), but the RK4-Stratonovich scheme itself
    conserves ‖y‖ to discretization error; exact conservation holds when
    generating with norm_correction=True."""
    d = 6
    key_data, key_sde, key_t, key_s = jax.random.split(rng, 4)
    y0 = jax.random.normal(key_data, (64, d)) * 2.0 + 1.0
    n0 = jnp.linalg.norm(y0, axis=1)
    t = jax.random.uniform(key_t, (64,))

    def median_drift(steps):
        sde = MSGMSde.create(
            key_sde, y0, dense_tensor=dense_tensor, num_steps_forward=steps
        )
        yt = sde.sample(key_s, t, y0)
        return float(jnp.median(jnp.abs(jnp.linalg.norm(yt, axis=1) / n0 - 1)))

    # unprojected scheme: small typical drift that shrinks with dt
    d32, d128 = median_drift(32), median_drift(128)
    assert d32 < 0.05
    assert d128 < d32

    # exact conservation on the norm-corrected (generation) path
    from sdeflow_tpu.sde.forward import ForwardFlow
    from sdeflow_tpu.ops.integrators import integrate_sde

    sde = MSGMSde.create(
        key_sde, y0, dense_tensor=dense_tensor, num_steps_forward=32
    )
    flow = ForwardFlow(base_sde=sde, T=sde.T)
    yT = integrate_sde(flow, y0, key_s, 32, method="rk4", norm_correction=True)
    assert jnp.allclose(jnp.linalg.norm(yT, axis=1), n0, rtol=1e-4)


def test_sample_scheme_small_t_fallback(rng):
    """Times below one grid step take the masked 1-step path and must still
    approximately preserve the norm and stay finite."""
    d = 4
    key_data, key_sde, key_s = jax.random.split(rng, 3)
    y0 = jax.random.normal(key_data, (16, d))
    sde = MSGMSde.create(key_sde, y0, num_steps_forward=16)
    t = jnp.full((16,), 0.01)  # < T/num_steps = 0.0625
    yt = sde.sample(key_s, t, y0)
    assert bool(jnp.isfinite(yt).all())
    assert jnp.allclose(
        jnp.linalg.norm(yt, axis=1), jnp.linalg.norm(y0, axis=1), rtol=0.02
    )
    # and it actually moved
    assert float(jnp.mean(jnp.abs(yt - y0))) > 1e-4


def test_ecdf_latent_radius_roundtrip(rng):
    """Latent radii drawn via ecdf inverse-quantiles must reproduce the
    empirical distribution of the training norms."""
    d = 3
    key_data, key_sde, key_lat = jax.random.split(rng, 3)
    y0 = jax.random.normal(key_data, (5000, d)) * jnp.asarray([1.0, 2.0, 0.5])
    sde = MSGMSde.create(key_sde, y0, norm_map=None)
    x0 = sde.latent_sample(key_lat, 20000, d)
    r_gen = np.asarray(jnp.linalg.norm(x0, axis=1))
    r_data = np.asarray(jnp.linalg.norm(y0, axis=1))
    for q in (0.1, 0.5, 0.9):
        assert abs(np.quantile(r_gen, q) - np.quantile(r_data, q)) < 0.05 * (
            1 + np.quantile(r_data, q)
        )
    # directions uniform: mean ≈ 0
    assert np.abs(np.asarray(jnp.mean(x0 / jnp.linalg.norm(x0, axis=1, keepdims=True), axis=0))).max() < 0.02


def test_log_norm_map_roundtrip(rng):
    d = 3
    key_data, key_sde, key_lat = jax.random.split(rng, 3)
    y0 = jax.random.normal(key_data, (4000, d))
    sde = MSGMSde.create(key_sde, y0, norm_map="log")
    assert "logNorm" in sde.name
    x0 = sde.latent_sample(key_lat, 20000, d)
    r_gen = np.asarray(jnp.linalg.norm(x0, axis=1))
    r_data = np.asarray(jnp.linalg.norm(y0, axis=1))
    assert abs(np.median(r_gen) - np.median(r_data)) < 0.05


def test_kde_logpdf_matches_sklearn(rng):
    """Our jnp KDE must agree with sklearn's KernelDensity (the reference's
    host-side implementation, SDEs.py:240)."""
    sklearn = pytest.importorskip("sklearn.neighbors")
    centers = np.abs(np.random.RandomState(0).randn(500)) + 0.5
    bw = 0.1 * centers.std()
    q = np.linspace(0.3, 2.5, 50)
    ours = np.asarray(gaussian_kde_logpdf(jnp.asarray(q), jnp.asarray(centers), bw))
    kde = sklearn.KernelDensity(kernel="gaussian", bandwidth=bw).fit(
        centers.reshape(-1, 1)
    )
    theirs = kde.score_samples(q.reshape(-1, 1))
    assert np.allclose(ours, theirs, atol=1e-4)


def test_kde_sampler_distribution(rng):
    centers = jnp.concatenate([jnp.zeros(500), jnp.ones(500) * 4.0])
    bw = jnp.asarray(0.1)
    s = gaussian_kde_sample(rng, centers, bw, 40000)
    s = np.asarray(s)
    assert abs(s.mean() - 2.0) < 0.05
    assert abs((s > 2.0).mean() - 0.5) < 0.02


def test_cond_latent_keeps_radius(rng):
    d = 5
    key_data, key_sde, key_c = jax.random.split(rng, 3)
    y0 = jax.random.normal(key_data, (100, d))
    sde = MSGMSde.create(key_sde, y0)
    x = jax.random.normal(jax.random.fold_in(rng, 9), (32, d))
    yT = sde.cond_latent_sample(key_c, jnp.zeros((32,)), x)
    assert jnp.allclose(
        jnp.linalg.norm(yT, axis=1), jnp.linalg.norm(x, axis=1), rtol=1e-5
    )


def test_project_training_norms_option(rng):
    """Opt-in exact norm projection of the training-time perturbation (our
    documented improvement knob; default off = reference-faithful)."""
    d = 6
    key_data, key_sde, key_t, key_s = jax.random.split(rng, 4)
    y0 = jax.random.normal(key_data, (32, d)) * 2.0 + 1.0
    sde = MSGMSde.create(
        key_sde, y0, num_steps_forward=16, project_training_norms=True
    )
    t = jax.random.uniform(key_t, (32,))
    yt = sde.sample(key_s, t, y0)
    assert jnp.allclose(
        jnp.linalg.norm(yt, axis=1), jnp.linalg.norm(y0, axis=1), rtol=1e-4
    )
    traj = sde.sample_scheme_allt(key_s, y0)
    assert jnp.allclose(
        jnp.linalg.norm(traj[-1], axis=1), jnp.linalg.norm(y0, axis=1),
        rtol=1e-4,
    )


def test_ecdf_interp_matches_quantile(rng):
    """The sorted-interp inverse-cdf draw is the exact law of
    jnp.quantile(r_T, u) — same linear interpolation between order
    statistics — without embedding a sort in the compiled program."""
    k_data, k_sde, k_u = jax.random.split(rng, 3)
    y0 = jax.random.normal(k_data, (1000, 3)) * 2.0
    sde = MSGMSde.create(k_sde, y0, num_steps_forward=4, norm_map="log")
    u = jax.random.uniform(k_u, (4096,))
    expect = jnp.exp(jnp.quantile(sde.r_T, u)) - 1e-6
    r = jax.jit(lambda k: sde.gen_radial_distribution(k, 4096))
    # reproduce the same uniforms the method draws internally
    got = jnp.exp(
        jnp.interp(u * (sde.r_T.shape[0] - 1),
                   jnp.arange(sde.r_T.shape[0], dtype=u.dtype), sde.r_T)
    ) - 1e-6
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    # and the public draw stays finite/positive with the right shape
    out = r(k_u)
    assert out.shape == (4096, 1) and bool(jnp.all(jnp.isfinite(out)))
