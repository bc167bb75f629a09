"""Plug-in reverse SDE: generative flow + score-matching losses.

TPU-native rewrite of the reference's `PluginReverseSDE`
(reference: SDEs.py:538-729). The learned drift is a pure function
``a_apply(a_params, y, t) -> (B, d)`` (e.g. a Flax module's apply);
the struct carries the params as a pytree leaf and the apply fn as static
metadata, so the whole object can flow through `jax.jit`/`jax.grad`.

Loss design: the Hutchinson divergence term vᵀ(∂mu/∂y)v is computed with a
forward-mode `jax.jvp` (one extra score-net forward) instead of the
reference's VJP with create_graph (SDEs.py:640-642); under `jax.grad` of the
loss this avoids grad-of-grad graphs and compiles to a clean XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from sdeflow_tpu.ops.hutchinson import sample_v, hutchinson_div


def _trow(t, batch, dtype):
    """Normalize a time value to a (B,) row for score-net conditioning."""
    t = jnp.asarray(t, dtype)
    if t.ndim == 0:
        return jnp.full((batch,), t, dtype)
    return t.reshape(-1)


@struct.dataclass
class PluginReverseSDE:
    """Invert a base SDE with drift f and diffusion g via a learned drift a:
      reverse drift  f ← g·a − f + ∇·Σ   (time inverted)
      diffusion      g ← g
    (reference: SDEs.py:538-588). Implements the integrator flow protocol, so
    it can be passed directly to the `ops.integrators` samplers, like the
    reference passes gen_sde to rk4_stratonovich_sampler.
    """

    base_sde: Any
    a_params: Any
    T: jnp.ndarray

    a_apply: Callable = struct.field(pytree_node=False)
    vtype: str = struct.field(pytree_node=False, default="rademacher")
    ssm_intT: bool = struct.field(pytree_node=False, default=False)
    debias: bool = struct.field(pytree_node=False, default=False)
    # output parameterization of the learned drift (beyond-reference knob;
    # the reference always learns a directly, SDEs.py:563-579):
    #   "direct": a(y,t) = net(y,t)
    #   "eps":    a(y,t) = -(g(t)/std(t)) · net(y,t) — the net predicts the
    #             O(1) noise ε instead of the score-scaled drift, whose
    #             magnitude grows like g/std ≈ 23 at t_epsilon for the
    #             default VP schedule (DDPM/score_sde ε-prediction; EDM-style
    #             output preconditioning). Better-conditioned targets for
    #             training — required for bf16 compute dtypes on SGM, where
    #             learning the large-magnitude direct output was measured
    #             4× worse (BF16_ABLATION_UNET1D.json). Closed-form-kernel
    #             SDEs only (SGM).
    parameterization: str = struct.field(pytree_node=False, default="direct")
    # static index of the first forward-grid step with t > t_epsilon
    # (replaces the reference's data-dependent boolean mask drop,
    #  SDEs.py:695-706, with a static slice)
    intT_start: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(
        cls,
        base_sde,
        a_apply,
        a_params,
        T=None,
        vtype="rademacher",
        ssm_intT=False,
        debias=False,
        parameterization="direct",
    ):
        if parameterization not in ("direct", "eps"):
            raise ValueError(f"Unknown parameterization: {parameterization}")
        if parameterization == "eps" and not hasattr(base_sde, "var"):
            raise ValueError(
                'parameterization="eps" requires a closed-form forward '
                "kernel (SGM): the output scale is g(t)/std(t)"
            )
        if debias and not hasattr(base_sde, "var"):
            # the g²/std² importance law needs the closed-form variance
            # (SGMSde.sample_debiasing_t); fail at create(), not trace time
            raise ValueError(
                "debias=True requires an SDE with a closed-form forward "
                "kernel (SGM): the debiasing density is g(t)²/std(t)²"
            )
        T = base_sde.T if T is None else jnp.asarray(T)
        num_steps = base_sde.num_steps_forward
        grid = np.linspace(
            float(T) / num_steps, float(T), num_steps
        )  # reference: SDEs.py:699-700
        intT_start = int(np.sum(grid <= float(base_sde.t_epsilon)))
        return cls(
            base_sde=base_sde,
            a_params=a_params,
            T=T,
            a_apply=a_apply,
            vtype=vtype,
            ssm_intT=ssm_intT,
            debias=debias,
            parameterization=parameterization,
            intT_start=intT_start,
        )

    # -- learned drift --------------------------------------------------------
    def score(self, y, t):
        """a(y, t) with t normalized to (B,) (reference calls a(y, s.squeeze())).

        The output is cast back to y.dtype: with a bfloat16 compute-dtype
        score net (mixed-precision training/serving) the SDE algebra, the
        Hutchinson JVP reduction and the ‖a‖² loss term all run in fp32 —
        jnp's promotion rules would upcast the products anyway, so for the
        existing fp32 paths this is bitwise-identical.

        Under parameterization="eps" the net output is rescaled by
        -g(t)/std(t), so downstream consumers (losses, samplers, NLL)
        still see the same object a ≈ gᵀ∇log q either way."""
        a = self.a_apply(self.a_params, y, _trow(t, y.shape[0], y.dtype))
        a = a.astype(y.dtype)
        if self.parameterization == "eps":
            # clamp the scale's time at t_epsilon: std(0) = 0 and the
            # reverse solve evaluates s = T − t all the way to s → 0,
            # below the training truncation (SDEs.py:684-693) — the same
            # region where the direct net extrapolates
            tt = jnp.maximum(
                _trow(t, y.shape[0], y.dtype), self.base_sde.t_epsilon
            ).reshape((-1,) + (1,) * (y.ndim - 1))
            std = jnp.sqrt(self.base_sde.var(tt))
            a = -(self.base_sde.g_diag(tt.reshape(-1), y) / std) * a
        return a

    def ga(self, s, y):
        """g(s,y)·a(y,s) — covers the reference's dense einsum / sparse
        scatter / diagonal branches (SDEs.py:563-579) via the base SDE's
        sigma_apply action."""
        return self.base_sde.sigma_apply(s, y, self.score(y, s))

    # -- flow protocol (reverse direction) -------------------------------------
    def ga_m_drift(self, s, y, lmbd=0.0):
        """(1−λ/2)·g·a − f + (1−λ)·∇·Σ  (reference: SDEs.py:560-561)."""
        return (
            (1.0 - 0.5 * lmbd) * self.ga(s, y)
            - self.base_sde.f(s, y)
            + (1.0 - lmbd) * self.base_sde.div_sigma(s, y)
        )

    def mu(self, t, y, lmbd=0.0):
        """Itô reverse drift, time-inverted (reference: SDEs.py:556-557)."""
        return self.ga_m_drift(self.T - t, y, lmbd)

    def mu_strato(self, t, y, lmbd=0.0):
        """(reference: SDEs.py:583-584)"""
        return self.mu(t, y, lmbd) - 0.5 * (1.0 - lmbd) * self.base_sde.div_sigma(
            self.T - t, y
        )

    def sigma_apply(self, t, y, w, lmbd=0.0):
        """σ(t)·w = √(1−λ)·g(T−t,y)·w (reference: SDEs.py:587-588)."""
        return jnp.sqrt(1.0 - lmbd) * self.base_sde.sigma_apply(self.T - t, y, w)

    def mu_ode(self, t, y):
        """Reversed-time probability-flow ODE drift (no reference
        counterpart; Song et al. 2021 eq. 13). The forward PF-ODE sharing
        the SDE's marginals is dy/dt = f − ½∇·Σ − ½Σ∇log p; with the
        plugin identity g·a ≈ Σ∇log p (the λ=0 reverse drift matches
        Anderson's, reference SDEs.py:560-561) the reversed-time drift is

            ½·g·a − f + ½·∇·Σ    (evaluated at s = T − t).

        For SGM (∇·Σ = 0, SDEs.py:189-190) this is exactly the reference's
        λ=1 drift; for MSGM (∇·Σ = 2f, SDEs.py:420-421) it reduces to
        ½·g·a — NOT the λ=1 formula, whose (1−λ) factor drops the ½∇·Σ
        term the exact PF-ODE keeps. Integrate with `ops.ode.integrate_ode`.
        """
        s = self.T - t
        return (
            0.5 * self.ga(s, y)
            - self.base_sde.f(s, y)
            + 0.5 * self.base_sde.div_sigma(s, y)
        )

    # -- Langevin corrector (predictor–corrector sampling) ---------------------
    def corrector_drift(self, t, y):
        """Preconditioned Langevin drift Γ∇log p + ∇·Γ with mobility
        Γ = Σ(s,y) = g·gᵀ, at the frozen forward time s = T − t.

        No reference counterpart (the reference samples predictor-only,
        sde_scheme.py:44-269); this is Song et al. 2021's annealed-Langevin
        corrector generalized to state-dependent diffusion: the SSM loss
        trains a ≈ gᵀ∇log q (SDEs.py:617-646), so g·a = Σ∇log q is the
        mobility-preconditioned score, and adding ∇·Σ (= 0 for SGM
        SDEs.py:189-190, = 2f for MSGM SDEs.py:420-421) makes the Langevin
        diffusion  dx = (Γ∇log p + ∇·Γ)dh + √2·g dW  leave p_s exactly
        invariant even for MSGM's y-dependent skew g. s is clamped below at
        t_epsilon, matching the training-time truncation (SDEs.py:684-693).
        """
        s = jnp.maximum(self.T - t, self.base_sde.t_epsilon)
        return self.ga(s, y) + self.base_sde.div_sigma(s, y)

    def corrector_noise(self, t, y, z):
        """√(2h)-scaled noise direction: the action g(s,y)·z (so the injected
        covariance is 2h·Σ, matching `corrector_drift`'s mobility)."""
        s = jnp.maximum(self.T - t, self.base_sde.t_epsilon)
        return self.base_sde.sigma_apply(s, y, z)

    # -- time sampling ----------------------------------------------------------
    def sample_t(self, key, batch):
        """t ~ U(0,T], truncated below at t_epsilon (reference: SDEs.py:684-693)."""
        t = jax.random.uniform(key, (batch,)) * self.T
        return jnp.where(t <= self.base_sde.t_epsilon, self.base_sde.t_epsilon, t)

    def t_linspace(self):
        """Forward time grid (dt, 2dt, ..., T) with sub-t_epsilon entries
        dropped statically (reference: SDEs.py:695-706)."""
        num_steps = self.base_sde.num_steps_forward
        dt = self.T / num_steps
        grid = jnp.arange(1, num_steps + 1, dtype=jnp.float32) * dt
        return grid[self.intT_start :]

    def sample_txy(self, key, x):
        """Sample (t, x, y) for the SSM loss (reference: SDEs.py:648-682).

        Random-t mode: per-sample t and one forward perturbation.
        ssm_intT mode: the whole forward grid; the batch is flattened to
        (S'·B, d) with t varying slowest, matching the reference's reshape.
        y is stop-gradient'd (the reference samples under torch.no_grad()).
        """
        key_t, key_y = jax.random.split(key)
        if self.ssm_intT:
            batch, dim = x.shape
            t = self.t_linspace()  # (S',)
            y = self.base_sde.sample_scheme_allt(key_y, x, include_t0=False)
            y = y[self.intT_start :]  # (S', B, d)
            s = t.shape[0]
            t_flat = jnp.repeat(t, batch)  # (S'·B,)
            x_flat = jnp.tile(x, (s, 1))  # (S'·B, d)
            y_flat = y.reshape(s * batch, dim)
            return t_flat, x_flat, jax.lax.stop_gradient(y_flat)
        t = self.sample_t(key_t, x.shape[0])
        y = self.base_sde.sample(key_y, t, x)
        return t, x, jax.lax.stop_gradient(y)

    # -- losses -------------------------------------------------------------------
    def ssm(self, key, x):
        """Sliced/implicit score-matching loss per sample
        (reference: SDEs.py:607-614). Returns (B,) (or (S'·B,) in intT mode).
        """
        key_txy, key_v = jax.random.split(key)
        t, x, y = self.sample_txy(key_txy, x)
        return self.ssm_loss(key_v, t, x, y)

    def ssm_loss(self, key, t, x, y):
        """vᵀ(∂mu_to_div/∂y)v + ½‖a‖² with mu_to_div = ga_m_drift − ½∇·Σ
        (reference: SDEs.py:617-646). One JVP = one extra score-net forward.
        """
        v = jax.lax.stop_gradient(sample_v(key, x.shape, vtype=self.vtype))

        def field(yv):
            a = self.score(yv, t)
            ga = self.base_sde.sigma_apply(t, yv, a)
            # λ=0: ga − f + ∇·Σ − ½∇·Σ = ga − f + ½∇·Σ
            mu_to_div = (
                ga - self.base_sde.f(t, yv) + 0.5 * self.base_sde.div_sigma(t, yv)
            )
            return mu_to_div, a

        m_mu, _, a = hutchinson_div(field, y, v, has_aux=True)
        m_nu = 0.5 * jnp.sum(a**2, axis=tuple(range(1, a.ndim)))
        return m_mu + m_nu

    def dsm(self, key, x):
        """Denoising score matching ½‖a·std/g + ε‖² for SDEs with a
        closed-form kernel (reconstructed from the reference's commented-out
        dsm, SDEs.py:590-605; "DSM is not relevant in MSGM"). SGM only.
        """
        if not hasattr(self.base_sde, "mean_weight"):
            raise ValueError("DSM requires a closed-form forward kernel (SGM)")
        key_t, key_y = jax.random.split(key)
        if self.debias:
            t = self.base_sde.sample_debiasing_t(key_t, (x.shape[0],))
        else:
            t = self.sample_t(key_t, x.shape[0])
        y, target, std, g = self.base_sde.sample(key_y, t, x, return_noise=True)
        a = self.score(y, t)
        return 0.5 * jnp.sum(
            (a * std / g + target) ** 2, axis=tuple(range(1, x.ndim))
        )

    def elbo_random_t_slice(self, key, x):
        """ELBO estimate: log p_latent(y_T|x) − ssm/qt
        (reference: SDEs.py:708-721). The reference re-runs sample_txy just
        to rebuild (t, x) for the conditional latent (SDEs.py:717) — but
        cond_latent_sample never uses t and its x is x (tiled in intT mode),
        so we build x2 directly and skip that second forward solve (for MSGM
        a whole RK4 scan per evaluation)."""
        key_ssm, key_lat = jax.random.split(key)
        qt = 1.0 / self.T
        loss_ssm = self.ssm(key_ssm, x) / qt
        if self.ssm_intT:
            s = self.base_sde.num_steps_forward - self.intT_start
            x2 = jnp.tile(x, (s, 1))
        else:
            x2 = x
        t_dummy = jnp.zeros((x2.shape[0],), x.dtype)
        yT = self.base_sde.cond_latent_sample(key_lat, t_dummy, x2)
        lp = self.base_sde.log_latent_pdf(yT)
        lp = lp.reshape(x2.shape[0], -1).sum(axis=1)
        return lp - loss_ssm

    # -- latent sampling -------------------------------------------------------------
    def latent_sample(self, key, num_samples, n):
        return self.base_sde.latent_sample(key, num_samples, n)

    def cond_latent_sample(self, key, t, x):
        return self.base_sde.cond_latent_sample(key, t, x)
