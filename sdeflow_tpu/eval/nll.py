"""Exact log-likelihood via the probability-flow ODE.

No reference counterpart: the reference evaluates model fit only through
the ELBO lower bound (SDEs.py:708-721) and sample-space MMD. The PF-ODE
(Song et al. 2021, eq. 13; FFJORD) turns the trained score model into a
continuous normalizing flow with a computable exact density:

    log p_0(x) = log p_T(y_T) + ∫_0^T ∇·f̃(t, y_t) dt,
    dy/dt = f̃(t, y) := f(t, y) − ½∇·Σ(t, y) − ½·g·a(y, t),

integrated forward in time (data → latent) with the divergence accumulated
in the same `lax.scan` as the state. The divergence is either exact (d
extra score-net JVPs per stage — fine for small d) or a Hutchinson
estimate with probes fixed once per solve (the FFJORD discipline; one
extra JVP per probe per stage), reusing `ops.hutchinson`.

The lower integration limit is `t_epsilon` by default: the score net is
never trained below it (reference SDEs.py:684-693), and at t_epsilon the
forward kernel is within O(t_epsilon·β_min) of the identity, so
log p_{t_eps}(x) ≈ log p_0(x) to the same order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental.ode import odeint

from sdeflow_tpu.ops.hutchinson import sample_v
from sdeflow_tpu.ops.ode import _ODE_STEP_FNS, DOPRI_ATOL, DOPRI_RTOL


def _pf_field(gen_sde, t, y):
    """Forward-time PF-ODE drift f̃ (see module docstring)."""
    base = gen_sde.base_sde
    a = gen_sde.score(y, t)
    return (
        base.f(t, y)
        - 0.5 * base.div_sigma(t, y)
        - 0.5 * base.sigma_apply(t, y, a)
    )


def _make_aug_drift(gen_sde, divergence, probes):
    """(t, (y, ℓ)) ↦ (f̃(t, y), ∇·f̃(t, y)) with ∇· exact or Hutchinson."""

    def div_exact(t, y):
        field = lambda yy: _pf_field(gen_sde, t, yy)
        eye = jnp.eye(y.shape[-1], dtype=y.dtype)

        def one(e):
            _, tang = jax.jvp(field, (y,), (jnp.broadcast_to(e, y.shape),))
            return tang @ e  # (B,)

        return jax.vmap(one)(eye).sum(axis=0)

    def div_hutch(t, y):
        field = lambda yy: _pf_field(gen_sde, t, yy)

        def one(v):
            _, tang = jax.jvp(field, (y,), (v,))
            return jnp.sum(tang * v, axis=tuple(range(1, v.ndim)))

        return jax.vmap(one)(probes).mean(axis=0)

    div = div_exact if divergence == "exact" else div_hutch

    def drift(t, state):
        y, _ = state
        return _pf_field(gen_sde, t, y), div(t, y)

    return drift


def _tuple_step(step_fn, drift, t, state, delta):
    """Run an array-state ODE step componentwise over the (y, ℓ) tuple by
    flattening it into one (B, d+1) array — the step fns are linear in the
    state axpy structure, so stacking is exact."""
    y, logdet = state
    z = jnp.concatenate([y, logdet[:, None]], axis=-1)

    def zdrift(ti, zi):
        dy, dl = drift(ti, (zi[:, :-1], zi[:, -1]))
        return jnp.concatenate([dy, dl[:, None]], axis=-1)

    z_new = step_fn(zdrift, t, z, delta)
    return z_new[:, :-1], z_new[:, -1]


def exact_logp(
    gen_sde,
    x,
    key=None,
    *,
    num_steps=128,
    method="rk4",
    divergence="hutchinson",
    vtype="rademacher",
    n_probes=1,
    t0=None,
    return_latent=False,
    prior="exact",
    rtol=DOPRI_RTOL,
    atol=DOPRI_ATOL,
):
    """Exact log p(x) of the generative model at the data points x.

    Args:
      gen_sde: trained PluginReverseSDE.
      x: (B, d) data batch.
      key: PRNG key for the Hutchinson probes (unused when
        divergence="exact"); probes are drawn ONCE per solve.
      num_steps: static step count of the forward PF-ODE solve (ignored
        by "dopri", which controls its own steps via rtol/atol).
      method: "euler" | "heun" | "rk4" (fixed-step) or "dopri"
        (adaptive Dormand–Prince — the tolerance-targeted likelihood
        solve of Song et al. 2021 §D.2 / FFJORD, as one odeint program
        over the augmented (y, ℓ) pytree state).
      divergence: "exact" (d JVPs/stage) or "hutchinson" (n_probes
        JVPs/stage, unbiased).
      t0: lower integration limit; defaults to base_sde.t_epsilon.
      return_latent: also return y_T (the ODE encoding of x).
      prior: "exact" (default) evaluates the latent prior with the SDE's
        properly normalized density (`log_latent_pdf_exact` where defined
        — MSGM's radial law; SGM's Gaussian is already exact), so the
        result is a true log-likelihood. "model" forces the
        reference-faithful `log_latent_pdf` (for MSGM that reproduces the
        reference's acknowledged mis-normalization, SDEs.py:504-505 — the
        quantity its ELBO is built on, comparable but not normalized).

    Returns:
      (B,) log-densities in nats (and y_T if return_latent).
    """
    base = gen_sde.base_sde
    x = jnp.asarray(x)
    t0 = jnp.asarray(base.t_epsilon if t0 is None else t0, x.dtype)
    T = jnp.asarray(gen_sde.T, x.dtype)
    delta = (T - t0) / num_steps
    step_fn = None if method == "dopri" else _ODE_STEP_FNS[method]

    if divergence == "hutchinson":
        if key is None:
            raise ValueError("hutchinson divergence needs a PRNG key")
        probes = sample_v(
            key, (n_probes,) + x.shape, vtype=vtype, dtype=x.dtype
        )
    else:
        probes = None
    drift = _make_aug_drift(gen_sde, divergence, probes)
    init = (x, jnp.zeros((x.shape[0],), x.dtype))

    if method == "dopri":
        # odeint handles the (y, ℓ) tuple as a pytree state; clip t to
        # the drift's valid domain (internal steps overshoot the final
        # knot before interpolating back — see ops/ode._integrate_dopri)
        def f_aug(state, t):
            return drift(jnp.clip(t, t0, T), state)

        ys = odeint(f_aug, init, jnp.stack([t0, T]), rtol=rtol, atol=atol)
        y_T, int_div = ys[0][-1], ys[1][-1]
    else:
        def body(state, i):
            t = t0 + i.astype(x.dtype) * delta
            return _tuple_step(step_fn, drift, t, state, delta), None

        (y_T, int_div), _ = jax.lax.scan(body, init, jnp.arange(num_steps))

    if prior == "exact":
        lp_fn = getattr(base, "log_latent_pdf_exact", base.log_latent_pdf)
    elif prior == "model":
        lp_fn = base.log_latent_pdf
    else:
        raise ValueError(f"unknown prior {prior!r} (exact|model)")
    lp_prior = lp_fn(y_T)
    lp_prior = lp_prior.reshape(x.shape[0], -1).sum(axis=1)
    logp = lp_prior + int_div
    if return_latent:
        return logp, y_T
    return logp


def nll_bits_per_dim(gen_sde, x, key=None, **kwargs):
    """Negative log-likelihood in bits per dimension (the standard
    density-modeling report unit)."""
    logp = exact_logp(gen_sde, x, key, **kwargs)
    d = x.reshape(x.shape[0], -1).shape[1]
    return -logp / (d * jnp.log(2.0))


def nll_summary(gen_sde, x, key, *, num_steps=64, max_points=512,
                divergence="hutchinson", **kwargs):
    """One measurement protocol for reporting a trained model's NLL:
    bits/dim over (at most max_points of) a test batch, Hutchinson
    divergence by default, non-finite values dropped. Returns
    {mean, stderr, n, steps} with None mean/stderr when NO point is
    finite (a diverged arm) — callers can json.dump it as-is (strict
    JSON has no NaN). Shared by the experiment driver's --eval-nll and
    tools/ode_study.py so their artifacts use identical numbers."""
    import numpy as np

    x = x[: min(max_points, x.shape[0])]
    bpd = jax.jit(
        lambda xx, kk: nll_bits_per_dim(
            gen_sde, xx, kk, num_steps=num_steps, divergence=divergence,
            **kwargs,
        )
    )(x, key)
    bpd = np.asarray(bpd)
    finite = bpd[np.isfinite(bpd)]
    if finite.size == 0:
        return dict(mean=None, stderr=None, n=0, steps=int(num_steps))
    return dict(
        mean=float(finite.mean()),
        stderr=float(finite.std() / finite.size ** 0.5),
        n=int(finite.size),
        steps=int(num_steps),
    )
