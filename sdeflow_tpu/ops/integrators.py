"""Stochastic integrators as single `jax.lax.scan` XLA programs.

TPU-native rewrite of the reference's Python-loop samplers
(reference: sde_scheme.py:18-269). Design differences:

- Each solve is ONE scan: the per-step drift, the score-net evaluations
  hidden inside the flow's drift, the diffusion action, the RK4 combine and
  the optional norm re-projection compile into a single XLA program — the
  reference instead runs a Python loop with a device→host copy per step
  (sde_scheme.py:257-258).
- Trajectories (`keep_all`) are the scan's stacked outputs, kept on device.
- The Wiener increment is drawn once per step from a folded PRNG key and is
  shared across all Runge-Kutta stages, exactly like the reference
  (sde_scheme.py:227, 144).
- The diffusion enters only through ``flow.sigma_apply(t, y, w)`` — the
  action of g(t,y) on a vector — which covers the reference's dense einsum,
  sparse scatter_add and diagonal cases of `EMstep` (sde_scheme.py:18-40)
  without ever materializing g.
- `integrate_select` replaces the reference's ragged `samplesToKeep`
  bookkeeping (sde_scheme.py:89-92) with a masked carry update.

The flow protocol: an object with attributes/methods
  T                      — time horizon (scalar array)
  mu(t, y, lmbd)         — Itô drift (used by Euler–Maruyama)
  mu_strato(t, y, lmbd)  — Stratonovich drift (used by Heun / RK4)
  sigma_apply(t, y, w, lmbd) — diffusion action g(t,y)·w
with t broadcastable against y ((B,1) column or scalar).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# -- single steps ------------------------------------------------------------


def em_step(flow, t, x, delta, dW, lmbd=0.0):
    """Euler–Maruyama step with the Itô drift (reference: sde_scheme.py:80-84)."""
    return x + flow.mu(t, x, lmbd) * delta + flow.sigma_apply(t, x, dW, lmbd)


def heun_step(flow, t, x, delta, dW, lmbd=0.0):
    """Heun (RK2) predictor-corrector in Stratonovich form
    (reference: sde_scheme.py:137-156)."""
    mu1 = flow.mu_strato(t, x, lmbd)
    s1 = flow.sigma_apply(t, x, dW, lmbd)
    x_pred = x + mu1 * delta + s1
    mu2 = flow.mu_strato(t + delta, x_pred, lmbd)
    s2 = flow.sigma_apply(t + delta, x_pred, dW, lmbd)
    return x + (mu1 + mu2) * (delta / 2) + (s1 + s2) / 2


def rk4_step(flow, t, x, delta, dW, lmbd=0.0):
    """RK4 for Stratonovich SDEs with skew-symmetric noise; the Wiener
    increment dW is shared across the four stages
    (reference: sde_scheme.py:222-253)."""

    def stage(ti, xi):
        return flow.mu_strato(ti, xi, lmbd) * delta + flow.sigma_apply(
            ti, xi, dW, lmbd
        )

    k1 = stage(t, x)
    k2 = stage(t + delta / 2, x + k1 / 2)
    k3 = stage(t + delta / 2, x + k2 / 2)
    k4 = stage(t + delta, x + k3)
    return x + (k1 + 2 * k2 + 2 * k3 + k4) / 6


_STEP_FNS = {"em": em_step, "heun": heun_step, "rk4": rk4_step}


def _resolve_step_fn(flow, method):
    """The flow may provide a whole-step override (e.g. ForwardFlow.rk4_step
    dispatches the circulant MSGM forward step to one fused Pallas program);
    otherwise use the generic per-stage composition."""
    override = getattr(flow, f"{method}_step", None)
    if override is not None:
        return lambda flow, t, x, delta, dW, lmbd: override(
            t, x, delta, dW, lmbd
        )
    return _STEP_FNS[method]


def _norm_project(x, norm0):
    """Exact norm re-projection x ← x·‖x_0‖/‖x‖ (reference: sde_scheme.py:85-86)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x * (norm0 / jnp.maximum(n, 1e-12))


# -- full solves -------------------------------------------------------------


def langevin_corrector(flow, x, key, t, num_corrector, *, snr=0.16,
                       norm0=None):
    """`num_corrector` preconditioned-Langevin MCMC steps targeting the
    marginal p at the frozen (reverse) time `t`, as one inner lax.scan.

    No reference counterpart (the reference samples predictor-only);
    this is the corrector half of Song et al. 2021 predictor–corrector
    sampling. The flow must provide `corrector_drift(t, y)` (the
    mobility-preconditioned score Γ∇log p + ∇·Γ; PluginReverseSDE
    implements it as g·a + ∇·Σ) and `corrector_noise(t, y, z)` (the g·z
    action). The step size is Song's SNR heuristic adapted to the
    preconditioning: ε = 2·(snr·‖g·z‖/‖drift‖)² from batch-mean norms, so
    one knob (snr) works across SDE families and noise scales.
    """

    def c_body(x, j):
        z = jax.random.normal(jax.random.fold_in(key, j), x.shape, x.dtype)
        d = flow.corrector_drift(t, x)
        gz = flow.corrector_noise(t, x, z)
        n_z = jnp.mean(jnp.linalg.norm(gz.reshape(gz.shape[0], -1), axis=-1))
        n_d = jnp.mean(jnp.linalg.norm(d.reshape(d.shape[0], -1), axis=-1))
        # a (near-)zero drift carries no score information — take no step
        # instead of letting the SNR ratio blow eps up to inf (a zero-init
        # score head at init would otherwise turn every sample NaN)
        safe = n_d > 1e-12 * n_z
        eps = jnp.where(
            safe, 2.0 * (snr * n_z / jnp.maximum(n_d, 1e-20)) ** 2, 0.0
        )
        x_new = x + eps * d + jnp.sqrt(2.0 * eps) * gz
        if norm0 is not None:
            x_new = _norm_project(x_new, norm0)
        return x_new, None

    x, _ = jax.lax.scan(c_body, x, jnp.arange(num_corrector))
    return x


def integrate_sde(
    flow,
    x0,
    key,
    num_steps,
    *,
    method="rk4",
    lmbd=0.0,
    T=None,
    norm_correction=False,
    keep_all=False,
    include_t0=False,
    corrector_steps=0,
    snr=0.16,
):
    """Integrate an SDE flow for `num_steps` uniform steps in one lax.scan.

    Args:
      flow: flow-protocol object (see module docstring).
      x0: (B, d) initial states.
      key: PRNG key (per-step keys are folded in).
      num_steps: static step count.
      method: "em" | "heun" | "rk4".
      T: optional horizon override, scalar or (B, 1) per-sample (the
        reference's `T_` argument, sde_scheme.py:54-57 — per-sample horizons
        generalize its scalar form).
      norm_correction: re-project to the initial norm each step.
      keep_all: return the whole trajectory (S, B, d) instead of (B, d);
        S = num_steps (+1 if include_t0 prepends x0).
      corrector_steps: if > 0, run that many Langevin corrector MCMC steps
        (see `langevin_corrector`) after every predictor step — Song et al.
        2021 predictor–corrector sampling; requires the flow to implement
        `corrector_drift`/`corrector_noise` (PluginReverseSDE does).
      snr: corrector signal-to-noise step-size knob.
    """
    step_fn = _resolve_step_fn(flow, method)
    x0 = jnp.asarray(x0)
    T = flow.T if T is None else T
    delta = jnp.asarray(T, dtype=x0.dtype) / num_steps
    sqrt_delta = jnp.sqrt(delta)
    norm0 = jnp.linalg.norm(x0, axis=-1, keepdims=True) if norm_correction else None

    def body(x, i):
        dW = sqrt_delta * jax.random.normal(
            jax.random.fold_in(key, i), x.shape, dtype=x.dtype
        )
        t = i.astype(x.dtype) * delta
        x_new = step_fn(flow, t, x, delta, dW, lmbd)
        if norm_correction:
            x_new = _norm_project(x_new, norm0)
        if corrector_steps:
            # key domain disjoint from the predictor's fold_in(key, i),
            # i ∈ [0, num_steps): offset by num_steps + per-step stride
            k_c = jax.random.fold_in(key, num_steps + 1 + i)
            x_new = langevin_corrector(
                flow, x_new, k_c, t + delta, corrector_steps, snr=snr,
                norm0=norm0,
            )
        return x_new, (x_new if keep_all else None)

    x_final, traj = jax.lax.scan(body, x0, jnp.arange(num_steps))
    if not keep_all:
        return x_final
    if include_t0:
        traj = jnp.concatenate([x0[None], traj], axis=0)
    return traj


def integrate_select(
    flow,
    x0,
    key,
    num_steps,
    select_idx,
    *,
    method="rk4",
    lmbd=0.0,
    T=None,
    norm_correction=False,
):
    """Integrate and return, per sample b, the state after select_idx[b] steps.

    Memory-light replacement for the reference's trajectory + samplesToKeep
    gather (sde_scheme.py:89-92): the scan carries a `kept` buffer updated by
    a masked select, so the (S, B, d) trajectory is never materialized. This
    is the hot path of the MSGM training loss (one full forward solve per
    train step, SDEs.py:78-122).

    select_idx: (B,) int32 in [0, num_steps]; index 0 returns x0.
    """
    step_fn = _resolve_step_fn(flow, method)
    x0 = jnp.asarray(x0)
    T = flow.T if T is None else T
    delta = jnp.asarray(T, dtype=x0.dtype) / num_steps
    sqrt_delta = jnp.sqrt(delta)
    norm0 = jnp.linalg.norm(x0, axis=-1, keepdims=True) if norm_correction else None

    def body(carry, i):
        x, kept = carry
        dW = sqrt_delta * jax.random.normal(
            jax.random.fold_in(key, i), x.shape, dtype=x.dtype
        )
        t = i.astype(x.dtype) * delta
        x_new = step_fn(flow, t, x, delta, dW, lmbd)
        if norm_correction:
            x_new = _norm_project(x_new, norm0)
        kept = jnp.where((select_idx == i + 1)[:, None], x_new, kept)
        return (x_new, kept), None

    (_, kept), _ = jax.lax.scan(body, (x0, x0), jnp.arange(num_steps))
    return kept


# -- reference-named convenience wrappers ------------------------------------

euler_maruyama_sampler = partial(integrate_sde, method="em")
heun_sampler = partial(integrate_sde, method="heun")
rk4_stratonovich_sampler = partial(integrate_sde, method="rk4")
