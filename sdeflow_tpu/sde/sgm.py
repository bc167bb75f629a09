"""Variance-preserving (Song et al. 2021) additive SDE — the "SGM" model.

TPU-native rewrite of the reference's `SGMsde` (reference: SDEs.py:161-215).
Closed-form perturbation kernel, Gaussian latent, isotropic diagonal
diffusion. Pure pytree dataclass; all sampling takes explicit PRNG keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from sdeflow_tpu.sde.base import SDEBehavior, _tcol

LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class SGMSde(SDEBehavior):
    """dY = −½β(t)Y dt + √β(t) dB (VP-SDE, eq. 32-33 of Song et al. 2021)."""

    beta_min: jnp.ndarray
    beta_max: jnp.ndarray
    T: jnp.ndarray
    t_epsilon: jnp.ndarray
    num_steps_forward: int = struct.field(pytree_node=False, default=100)

    # static metadata
    norm_correction: bool = struct.field(pytree_node=False, default=False)
    name: str = struct.field(pytree_node=False, default="SGM")

    @classmethod
    def create(
        cls,
        beta_min=0.1,
        beta_max=20.0,
        T=1.0,
        t_epsilon=0.001,
        num_steps_forward=100,
        dtype=jnp.float32,
    ):
        return cls(
            beta_min=jnp.asarray(beta_min, dtype),
            beta_max=jnp.asarray(beta_max, dtype),
            T=jnp.asarray(T, dtype),
            t_epsilon=jnp.asarray(t_epsilon, dtype),
            num_steps_forward=int(num_steps_forward),
        )

    @property
    def dim(self):
        return None  # dimension-agnostic

    @property
    def logvar_mean_T(self):
        """Stationary latent law: N(0, 1) per dim — (logvar, mean) = (0, 0)
        (reference: SDEs.py:171-175)."""
        return jnp.zeros(1), jnp.zeros(1)

    # -- closed-form moments (reference SDEs.py:177-181) --------------------
    def mean_weight(self, t):
        return jnp.exp(
            -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        )

    def var(self, t):
        return 1.0 - jnp.exp(
            -0.5 * t**2 * (self.beta_max - self.beta_min) - t * self.beta_min
        )

    # -- drift / diffusion (reference SDEs.py:183-194) ----------------------
    def f(self, t, y):
        return -0.5 * self.beta(_tcol(t, y)) * y

    def f_strato(self, t, y):
        return -0.5 * self.beta(_tcol(t, y)) * y

    def div_sigma(self, t, y):
        return jnp.zeros_like(y)

    def g_diag(self, t, y):
        """Diagonal of g (isotropic): √β(t) · 1."""
        return jnp.ones_like(y) * jnp.sqrt(self.beta(_tcol(t, y)))

    def sigma_apply(self, t, y, w):
        """g(t,y) · w for isotropic diagonal diffusion."""
        return jnp.sqrt(self.beta(_tcol(t, y))) * w

    # -- forward perturbation (reference SDEs.py:196-199) -------------------
    def sample(self, key, t, y0, return_noise=False):
        return self.sample_song_et_al(key, t, y0, return_noise=return_noise)

    # -- debiased time sampling (reference SDEs.py:148-155) ------------------
    def _B(self, t):
        """Integrated schedule B(t) = ∫₀ᵗ β(s) ds for the linear β."""
        return self.beta_min * t + 0.5 * (self.beta_max - self.beta_min) * t**2

    def sample_debiasing_t(self, key, shape):
        """Importance-sampled t with density q(t) ∝ g(t)²/std(t)², truncated
        below at t_epsilon — the likelihood-weighting law of Song et al.
        2021 (eq. 14). The reference declares this sampler but raises
        NotImplementedError (SDEs.py:148-155); here it is exact and closed
        form for the VP schedule:

          q(t) ∝ β(t)/var(t) = B'(t)/(1 − e^{−B(t)}),  B(t) = ∫₀ᵗ β
          CDF antiderivative  F(t) = log(e^{B(t)} − 1) = B(t) + log var(t)

        so inverse-CDF sampling is  L = F(t_ε) + u·(F(T) − F(t_ε)),
        B = softplus(L), and t solves the quadratic B(t) = B — all
        elementwise closed form (no grids, no rejection), jit-safe.
        """
        u = jax.random.uniform(key, shape)
        # F(t) = B(t) + log var(t); var = 1 − e^{−B} so this is
        # log(expm1(B)), computed stably for both small and large B.
        F_lo = self._B(self.t_epsilon) + jnp.log(self.var(self.t_epsilon))
        F_hi = self._B(self.T) + jnp.log(self.var(self.T))
        L = F_lo + u * (F_hi - F_lo)
        B = jax.nn.softplus(L)  # B = log(1 + e^L) inverts F exactly
        # solve beta_min·t + ½(beta_max−beta_min)·t² = B for t ≥ 0
        a = 0.5 * (self.beta_max - self.beta_min)
        b = self.beta_min
        disc = jnp.sqrt(jnp.maximum(b**2 + 4.0 * a * B, 0.0))
        # guard a≈0 (constant β): t = B/b; jnp.where keeps it branch-free
        t_quad = (disc - b) / jnp.where(a == 0.0, 1.0, 2.0 * a)
        t = jnp.where(a == 0.0, B / b, t_quad)
        return jnp.clip(t, self.t_epsilon, self.T)

    # -- latent prior (reference SDEs.py:201-215) ---------------------------
    def latent_sample(self, key, num_samples, n):
        return jax.random.normal(key, (num_samples, n), dtype=jnp.float32)

    def cond_latent_sample(self, key, t, x):
        """Conditional latent y_T | x via the forward kernel at T."""
        tT = jnp.full((x.shape[0],), 1.0, dtype=x.dtype) * self.T
        return self.sample(key, tT, x)

    def log_latent_pdf(self, yT):
        """Per-dimension standard-normal log density (B, d).

        Reproduces the reference's `log_normal` with its eps=1e-5 smoothing
        (reference: SDEs.py:209-215).
        """
        return self.log_normal(yT, jnp.zeros_like(yT), jnp.zeros_like(yT))

    @staticmethod
    def log_normal(x, mean, log_var, eps=1e-5):
        z = -0.5 * LOG_2PI
        return -((x - mean) ** 2) / (2.0 * jnp.exp(log_var) + eps) - log_var / 2.0 + z
