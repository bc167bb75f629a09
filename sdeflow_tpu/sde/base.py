"""Shared SDE machinery: β(t) schedule + numeric forward perturbation.

TPU-first redesign of the reference's `SDE` parent class
(reference: SDEs.py:49-155). Differences from the reference, by design:

- SDEs are immutable pytree dataclasses (``flax.struct.dataclass``), not
  mutable ``nn.Module`` objects with a ``.to(device)`` method — placement is
  handled by ``jax.sharding``, never by the SDE object.
- The numeric forward perturbation ``sample_scheme`` (reference
  SDEs.py:78-122) replaces its data-dependent Python loops (per-sample step
  counts, t>=T warning branch, sub-dt single-step fallback) with a single
  fixed-length ``lax.scan`` plus a per-sample gather and a masked one-step
  integrate — no ragged control flow, fully jittable.
- Randomness is explicit: every sampling function takes a PRNG key.

Shape conventions (same as the reference): states are flat ``(B, d)``
float32; times are ``(B,)`` / ``(B,1)`` / scalar and broadcast internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def beta_linear(t, beta_min, beta_max):
    """Linear noise schedule β(t) = β_min + (β_max − β_min)·t.

    (reference: SDEs.py:72-73)
    """
    return beta_min + (beta_max - beta_min) * t


def _tcol(t, y):
    """Broadcast a time array against a batch of states: -> (B,1) or scalar."""
    t = jnp.asarray(t, dtype=y.dtype)
    if t.ndim == 0:
        return t
    return t.reshape(t.shape[0], *([1] * (y.ndim - 1)))


class SDEBehavior:
    """Mixin with behavior shared by SGM and MSGM SDE pytrees.

    Subclasses (flax.struct dataclasses) must provide fields
    ``beta_min, beta_max, T, t_epsilon`` (array leaves) and
    ``num_steps_forward`` (static int), plus methods
    ``f(t, y)`` (Itô drift), ``f_strato(t, y)``, ``div_sigma(t, y)`` and
    ``sigma_apply(t, y, w)`` (action of the diffusion operator g(t,y) on a
    noise/score vector w — never materialized as a (B,d,d) tensor).
    """

    # Opt-in exact norm projection of the TRAINING-TIME forward perturbation
    # (see MSGMSde for semantics); declared here so every SDE has the knob
    # and the forward-sampling paths below can read it directly.
    project_training_norms: bool = False

    # -- schedule ----------------------------------------------------------
    def beta(self, t):
        return beta_linear(t, self.beta_min, self.beta_max)

    def ijk(self):
        """Sparse COO indices of the noise tensor; None unless the SDE uses
        the structured circulant G (reference IJK stub, SDEs.py:75-76)."""
        return None

    # -- numeric forward perturbation (MSGM path) ---------------------------
    def sample_scheme(self, key, t, y0):
        """Sample y_t | y_0 by numerically integrating the forward SDE.

        TPU-native equivalent of the reference's per-sample stepping
        (SDEs.py:78-122): one RK4-Stratonovich `lax.scan` over the full
        forward grid for the whole batch, a per-sample select of the state
        after ``floor(num_steps · t/T)`` steps, and — for samples whose t is
        below one grid step — a masked single RK4 step with per-sample dt.

        Args:
          key: PRNG key.
          t: (B,) or (B,1) per-sample times in [0, T].
          y0: (B, d) initial states.
        Returns:
          (B, d) perturbed states (stop-gradient semantics are the caller's
          responsibility, mirroring the reference's @torch.no_grad()).
        """
        from sdeflow_tpu.sde.forward import ForwardFlow
        from sdeflow_tpu.ops.integrators import integrate_select, rk4_step

        t = jnp.reshape(t, (y0.shape[0],)).astype(y0.dtype)
        num_steps = self.num_steps_forward
        T = jnp.asarray(self.T, dtype=y0.dtype)

        # per-sample number of full grid steps (t >= T clamps to num_steps,
        # mirroring the reference's include_t0 branch at SDEs.py:94-101)
        n_float = num_steps * t / T
        n_int = jnp.clip(jnp.floor(n_float).astype(jnp.int32), 0, num_steps)
        n_int = jnp.where(t >= T, num_steps, n_int)

        flow = ForwardFlow(base_sde=self, T=self.T)
        key_traj, key_one = jax.random.split(key)

        # The reference's training-time perturbation integrates WITHOUT norm
        # re-projection (SDEs.py:104-132 call the RK4 sampler with its
        # default norm_correction=False; projection only happens at
        # generation/diagnostic time, MSGM_higherDim.py:785, 906). The
        # project_training_norms flag opts into projecting here as well — a
        # measured quality improvement over the reference (PARITY.md).
        project = self.project_training_norms
        y_sel = integrate_select(
            flow,
            y0,
            key_traj,
            num_steps,
            select_idx=n_int,
            method="rk4",
            norm_correction=project,
        )

        # masked fallback: a single RK4 step of size t_b for n_int == 0
        # (reference SDEs.py:113-117)
        delta = _tcol(t, y0)
        dW = jnp.sqrt(jnp.maximum(delta, 0.0)) * jax.random.normal(
            key_one, y0.shape, dtype=y0.dtype
        )
        y_one = rk4_step(flow, jnp.zeros_like(delta), y0, delta, dW)
        if project:
            n0 = jnp.linalg.norm(y0, axis=-1, keepdims=True)
            n1 = jnp.linalg.norm(y_one, axis=-1, keepdims=True)
            y_one = y_one * (n0 / jnp.maximum(n1, 1e-12))

        return jnp.where((n_int > 0)[:, None], y_sel, y_one)

    def sample_scheme_allt(self, key, y0, include_t0=True):
        """Full forward trajectory y_0, y_{t_1}, ..., y_T | y_0.

        Returns (S, B, d) with S = num_steps_forward (+1 if include_t0),
        kept on device (the reference copies each step to host,
        sde_scheme.py:257-258 — we do not).
        (reference: SDEs.py:124-132)
        """
        from sdeflow_tpu.sde.forward import ForwardFlow
        from sdeflow_tpu.ops.integrators import integrate_sde

        flow = ForwardFlow(base_sde=self, T=self.T)
        # reference-faithful: unprojected unless project_training_norms
        # (see sample_scheme; reference SDEs.py:124-132)
        return integrate_sde(
            flow,
            y0,
            key,
            self.num_steps_forward,
            method="rk4",
            keep_all=True,
            include_t0=include_t0,
            norm_correction=self.project_training_norms,
        )

    def sample_debiasing_t(self, key, shape):
        """Non-uniform t sampling ∝ g²/std², truncated at t_epsilon
        (reference stub: SDEs.py:148-155 raises NotImplementedError).
        Implemented in closed form for the VP schedule on ``SGMSde``;
        SDEs without a closed-form kernel (MSGM) keep the reference's
        behavior here — and ``PluginReverseSDE.create`` rejects
        ``debias=True`` for them up front."""
        raise NotImplementedError(
            "debiased t sampling needs a closed-form kernel (see SGMSde)"
        )

    def sample_song_et_al(self, key, t, y0, return_noise=False):
        """Closed-form forward kernel y_t = mean_weight(t)·y_0 + std·ε.

        (reference: SDEs.py:134-146; requires subclass mean_weight/var)
        """
        tc = _tcol(t, y0)
        mu = self.mean_weight(tc) * y0
        std = jnp.sqrt(self.var(tc))
        epsilon = jax.random.normal(key, y0.shape, dtype=y0.dtype)
        yt = epsilon * std + mu
        if not return_noise:
            return yt
        return yt, epsilon, std, self.g_diag(tc, yt)
