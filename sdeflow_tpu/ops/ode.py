"""Deterministic (probability-flow ODE) integrators as single `lax.scan`s.

No reference counterpart: the reference samples only through the stochastic
reverse SDE (sde_scheme.py:44-269). The probability-flow ODE (Song et al.
2021, eq. 13) shares the SDE's marginals and gives deterministic generation
and exact likelihoods; this framework exposes it through the same flow
protocol as `ops.integrators`, with the drift provided by
`PluginReverseSDE.mu_ode` (sde/reverse.py).

Design mirrors `integrate_sde`: one `lax.scan` per solve, static step
count, trajectory capture on device, optional per-sample norm
re-projection. For MSGM the exact PF-ODE drift ½·g·a is pointwise
orthogonal to y (G is skew-symmetric in its first two indices, so
yᵀg(y)w = 0 for all w — reference SDEs.py:315-341), hence with an exact
score every sample's norm is conserved; `norm_correction` projects out the
radial component of the *learned* score's error, exactly like the SDE
sampler's re-projection (sde_scheme.py:254-255).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.ode import odeint

from sdeflow_tpu.ops.integrators import _norm_project


def euler_ode_step(drift, t, x, delta):
    return x + drift(t, x) * delta


def heun_ode_step(drift, t, x, delta):
    k1 = drift(t, x)
    k2 = drift(t + delta, x + k1 * delta)
    return x + (k1 + k2) * (delta / 2)


def rk4_ode_step(drift, t, x, delta):
    k1 = drift(t, x)
    k2 = drift(t + delta / 2, x + k1 * (delta / 2))
    k3 = drift(t + delta / 2, x + k2 * (delta / 2))
    k4 = drift(t + delta, x + k3 * delta)
    return x + (k1 + 2 * k2 + 2 * k3 + k4) * (delta / 6)


_ODE_STEP_FNS = {"em": euler_ode_step, "euler": euler_ode_step,
                 "heun": heun_ode_step, "rk4": rk4_ode_step}

# Default "dopri" error-control tolerances. Named so result artifacts
# (tools/ode_study.py rows) can record the values that actually governed
# an adaptive solve instead of hardcoding a copy.
DOPRI_RTOL = 1e-5
DOPRI_ATOL = 1e-5


def integrate_ode(
    flow,
    x0,
    num_steps,
    *,
    method="rk4",
    T=None,
    norm_correction=False,
    keep_all=False,
    include_t0=False,
    rtol=DOPRI_RTOL,
    atol=DOPRI_ATOL,
):
    """Integrate the reverse-time probability-flow ODE dx/ds = mu_ode(s, x)
    for `num_steps` uniform steps in one lax.scan.

    Args:
      flow: object with `T` and `mu_ode(t, y) -> (B, d)` (PluginReverseSDE).
      x0: (B, d) latent states (from `flow.latent_sample`).
      num_steps: static step count (for "dopri" only the trajectory-capture
        grid — the step size is chosen adaptively).
      method: "euler" | "heun" | "rk4" (classic fixed-step schemes) or
        "dopri" (adaptive Dormand–Prince 4(5), `jax.experimental.ode`):
        tolerance-targeted rather than budget-targeted sampling, and —
        unlike the DPM exponential integrators — valid for MSGM too (no
        closed-form kernel needed, only the drift).
      norm_correction: re-project to the initial norm (MSGM). Fixed-step
        methods project after EVERY step (in-dynamics, like the reference's
        sde_scheme.py:254-255); "dopri" has no per-step hook inside the
        adaptive while_loop, so it projects the CAPTURED states a
        posteriori — the terminal radius is restored exactly either way.
      rtol / atol: "dopri" error-control tolerances (ignored otherwise).
      keep_all: return the (S, B, d) trajectory instead of (B, d).

    Deterministic: no PRNG key — identical latents give bitwise-identical
    samples, which is what makes ODE generation useful for encode/decode
    round-trips and ablation-stable evals.
    """
    if method == "dopri":
        return _integrate_dopri(
            flow, x0, num_steps, T=T, rtol=rtol, atol=atol,
            norm_correction=norm_correction, keep_all=keep_all,
            include_t0=include_t0,
        )
    step_fn = _ODE_STEP_FNS[method]
    x0 = jnp.asarray(x0)
    T = flow.T if T is None else T
    delta = jnp.asarray(T, dtype=x0.dtype) / num_steps
    norm0 = jnp.linalg.norm(x0, axis=-1, keepdims=True) if norm_correction else None
    drift = flow.mu_ode

    def body(x, i):
        t = i.astype(x.dtype) * delta
        x_new = step_fn(drift, t, x, delta)
        if norm_correction:
            x_new = _norm_project(x_new, norm0)
        return x_new, (x_new if keep_all else None)

    x_final, traj = jax.lax.scan(body, x0, jnp.arange(num_steps))
    if not keep_all:
        return x_final
    if include_t0:
        traj = jnp.concatenate([x0[None], traj], axis=0)
    return traj


def _integrate_dopri(flow, x0, num_steps, *, T, rtol, atol,
                     norm_correction, keep_all, include_t0):
    """Adaptive PF-ODE solve via `jax.experimental.ode.odeint` (Dormand–
    Prince 4(5) with PI step-size control, compiled to one XLA
    while_loop program — jit/TPU-safe, dynamic trip count only).

    The solver picks its own steps to meet rtol/atol; `num_steps` only
    sets the capture grid when keep_all=True. No reference counterpart
    (the reference's solvers are all fixed-step, sde_scheme.py:44-269).
    """
    x0 = jnp.asarray(x0)
    T = flow.T if T is None else T
    T = jnp.asarray(T, dtype=x0.dtype)
    n_cap = num_steps if keep_all else 1
    ts = jnp.linspace(jnp.zeros((), x0.dtype), T, n_cap + 1)

    def f(y, t):
        # odeint's internal steps may overshoot ts[-1]=T before it
        # interpolates back; mu_ode's reverse clock s = T − t goes
        # negative there (sqrt(var<0) → NaN). Clip to the drift's valid
        # domain — the same [0, T] range the fixed-step schemes evaluate.
        return flow.mu_ode(jnp.clip(t, 0.0, T), y)

    ys = odeint(f, x0, ts, rtol=rtol, atol=atol)  # (n_cap+1, B, d), ys[0]=x0
    if norm_correction:
        norm0 = jnp.linalg.norm(x0, axis=-1, keepdims=True)
        ys = _norm_project(ys, norm0[None])
    if not keep_all:
        return ys[-1]
    return ys if include_t0 else ys[1:]


def encode_ode(
    flow,
    x,
    num_steps,
    *,
    method="rk4",
    T=None,
    t0=0.0,
    norm_correction=False,
    keep_all=False,
    include_t0=False,
    rtol=DOPRI_RTOL,
    atol=DOPRI_ATOL,
):
    """Encode data into the PF-ODE latent space: integrate the FORWARD-time
    probability-flow ODE dy/dt = f − ½∇·Σ − ½Σ∇log p from t=t0 (data) to
    t=T (the latent prior). With the default t0=0 it is the exact inverse
    of `integrate_ode` (which solves the full reversed [0, T] span) — for
    any drift field, trained or not — up to integration error, so
    ``integrate_ode(flow, encode_ode(flow, x, n), n) ≈ x``.

    This is the same transport as `eval.nll.exact_logp` WITHOUT the
    divergence accumulation (no per-step JVP), so it is the cheap path
    for deterministic inversion, interpolation, and editing workflows.
    Note exact_logp starts at t0 = base_sde.t_epsilon (the score net is
    untrained below it) — pass ``t0=flow.base_sde.t_epsilon`` to
    reproduce its y_T latent exactly; keep t0=0 to invert the sampler.
    No reference counterpart (the reference has no deterministic
    transport at all; its solvers are the stochastic sde_scheme.py ones).

    Other args match `integrate_ode`; the forward-time drift is its
    reverse-clock drift mirrored, −mu_ode(T − t, y), so every method
    ("euler" | "heun" | "rk4" | adaptive "dopri") and `norm_correction`
    (MSGM radial re-projection) work identically in this direction.
    """
    T_ = flow.T if T is None else T
    t0 = jnp.asarray(t0, jnp.asarray(x).dtype)
    span = T_ - t0

    class _Enc:  # minimal flow view: integrate_ode reads only .T / .mu_ode
        T = span

        @staticmethod
        def mu_ode(tau, y):
            # forward clock t = t0 + tau over [t0, T]; mu_ode's reverse
            # clock is s = T − t, so s = span − tau
            return -flow.mu_ode(span - tau, y)

    return integrate_ode(
        _Enc, x, num_steps, method=method, T=span,
        norm_correction=norm_correction, keep_all=keep_all,
        include_t0=include_t0, rtol=rtol, atol=atol,
    )


probability_flow_sampler = partial(integrate_ode, method="rk4")
