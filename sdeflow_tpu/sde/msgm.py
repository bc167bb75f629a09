"""Multiplicative Score-based Generative Model SDE: dY = √β(t) G(Y) ∘ dB.

TPU-native rewrite of the reference's `MSGMsde` (reference: SDEs.py:221-509):

- G is either a dense random skew-symmetric-sliced tensor (d ≤ ~32) or the
  structured circulant variant, applied as a jnp.roll stencil instead of the
  reference's COO scatter_add (see `sdeflow_tpu.ops.gapply`).
- The radial latent prior (empirical law of ‖y_0‖) lives on device: ecdf
  sampling is inverse-cdf interpolation over the (sorted-at-create) norms —
  the exact law of `jnp.quantile(r_T, U)` with no in-program sort — and the
  KDE is a jnp Gaussian mixture
  (`sdeflow_tpu.ops.kde`) — the reference round-trips to sklearn on host
  (SDEs.py:239-240, 444, 503-509).
- Immutable pytree; every sampler takes an explicit PRNG key.

Sign convention: the Itô drift is f = β(t)·L_G·y with L_G = ½Σ_k G_k G_k
negative-definite in BOTH the dense and circulant cases (for the circulant G,
L_G = −½I so f = −½β(t)y). The reference's sparse branch uses +½β(t)y
(SDEs.py:413) — inconsistent with its dense branch (SDEs.py:246, 410-415) but
latent there because its samplers use the Stratonovich drift (= 0) and the
SSM loss cancels f; we use the consistent sign. See ops/gapply.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from sdeflow_tpu.sde.base import SDEBehavior, _tcol
from sdeflow_tpu.ops.gapply import (
    make_dense_G,
    dense_sigma_apply,
    circulant_ijk,
)
from sdeflow_tpu.ops.kde import (
    gaussian_kde_logpdf,
    gaussian_kde_sample,
    kde_normalization_log_constant,
)
from sdeflow_tpu.ops.hutchinson import randu_on_sphere

_LOG_EPS = 1e-6  # reference: SDEs.py:236, 451


@struct.dataclass
class MSGMSde(SDEBehavior):
    """Norm-preserving multiplicative SDE with empirical radial latent prior."""

    beta_min: jnp.ndarray
    beta_max: jnp.ndarray
    T: jnp.ndarray
    t_epsilon: jnp.ndarray

    # noise tensor: dense (G, L_G) or structured circulant (both None)
    G: Optional[jnp.ndarray]
    L_G: Optional[jnp.ndarray]

    # radial prior state
    r_T: jnp.ndarray  # (N,) (possibly log-mapped) training norms, SORTED
    # ascending — create() establishes this; gen_radial_distribution's
    # inverse-cdf interp relies on it
    kde_bandwidth: jnp.ndarray
    cst_log_dens: jnp.ndarray

    # static config
    dim: int = struct.field(pytree_node=False, default=2)
    num_steps_forward: int = struct.field(pytree_node=False, default=100)
    circulant: bool = struct.field(pytree_node=False, default=False)
    norm_sampler: str = struct.field(pytree_node=False, default="ecdf")
    norm_map: Optional[str] = struct.field(pytree_node=False, default=None)
    norm_correction: bool = struct.field(pytree_node=False, default=True)
    # Optional: re-project each RK4 step of the TRAINING-TIME forward
    # perturbation to the exact conserved norm. The reference trains on
    # unprojected solves (SDEs.py:104-132 use the sampler's default
    # norm_correction=False). Enabling this removes the integrator's
    # norm-drift from the score-matching targets; measured sample quality
    # on the swissroll parity config is statistically indistinguishable
    # either way (PARITY.md). Default False = reference-faithful.
    project_training_norms: bool = struct.field(pytree_node=False, default=False)
    name: str = struct.field(pytree_node=False, default="MSGM")

    @classmethod
    def create(
        cls,
        key,
        y0,
        *,
        beta_min=0.1,
        beta_max=20.0,
        T=1.0,
        t_epsilon=0.001,
        num_steps_forward=100,
        dense_tensor=True,
        norm_sampler="ecdf",
        norm_map=None,
        kernel="gaussian",
        estimate_norm_constant=True,
        project_training_norms=False,
        dtype=jnp.float32,
    ):
        """Build the SDE from data y0: (N, d).

        Mirrors the reference constructor (SDEs.py:226-301): stores the
        empirical norms r_T (optionally log-mapped), a KDE bandwidth
        0.1·std(r_T), the G tensor (dense or circulant), and optionally the
        KDE normalizing constant.
        """
        if kernel != "gaussian":
            raise ValueError("only the gaussian KDE kernel is supported")
        y0 = jnp.asarray(y0, dtype)
        dim = int(y0.shape[1])
        r_T = jnp.linalg.norm(y0, axis=1)
        if norm_map == "log":
            r_T = jnp.log(r_T + _LOG_EPS)
        bandwidth = 0.1 * jnp.std(r_T)
        # Sort ONCE, eagerly: the ecdf inverse-cdf draw then becomes a
        # jnp.interp over a sorted constant instead of jnp.quantile, whose
        # embedded sort XLA constant-folds in its (interpreter-speed)
        # evaluator inside EVERY compiled sampling program — multi-second
        # compile cost per program shape at N=1e5. Order is irrelevant to
        # the KDE uses of r_T (mixture centers). Exact-same sampling law.
        r_T = jnp.sort(r_T)

        if dense_tensor:
            G, L_G = make_dense_G(key, dim, dtype=dtype)
        else:
            G, L_G = None, None

        if estimate_norm_constant:
            cst_log_dens = kde_normalization_log_constant(r_T, bandwidth)
        else:
            cst_log_dens = jnp.zeros((), dtype)

        name = "MSGM"
        if not dense_tensor:
            name += "_sparseTens"
        if norm_sampler != "ecdf":
            name += norm_sampler + kernel
        if norm_map == "log":
            name += "logNorm"

        return cls(
            beta_min=jnp.asarray(beta_min, dtype),
            beta_max=jnp.asarray(beta_max, dtype),
            T=jnp.asarray(T, dtype),
            t_epsilon=jnp.asarray(t_epsilon, dtype),
            G=G,
            L_G=L_G,
            r_T=r_T,
            kde_bandwidth=bandwidth,
            cst_log_dens=cst_log_dens,
            dim=dim,
            num_steps_forward=int(num_steps_forward),
            circulant=not dense_tensor,
            norm_sampler=norm_sampler,
            norm_map=norm_map,
            project_training_norms=project_training_norms,
            name=name,
        )

    # -- drift / diffusion ---------------------------------------------------
    def f(self, t, y):
        """Itô drift f = β(t)·L_G·y (reference: SDEs.py:410-415; see module
        docstring for the circulant sign convention)."""
        bt = self.beta(_tcol(t, y))
        if self.circulant:
            return -0.5 * bt * y
        return jnp.einsum("im,bm->bi", self.L_G, bt * y)

    def f_strato(self, t, y):
        """Stratonovich drift ≡ 0 (reference: SDEs.py:417-418)."""
        return jnp.zeros_like(y)

    def div_sigma(self, t, y):
        """∇·Σ = 2f (reference: SDEs.py:420-421)."""
        return 2.0 * self.f(t, y)

    def sigma_apply(self, t, y, w):
        """g(t,y)·w = √β(t)·Σ_{jk} G[i,j,k] y_j w_k
        (reference: SDEs.py:423-432 / sde_scheme.py:27-36). The circulant
        path dispatches to the fused Pallas stencil on TPU
        (ops/pallas/circulant.py)."""
        from sdeflow_tpu.ops.pallas.circulant import circulant_apply

        sqrt_bt = jnp.sqrt(self.beta(_tcol(t, y)))
        if self.circulant:
            return circulant_apply(sqrt_bt, y, w)
        return dense_sigma_apply(self.G, sqrt_bt, y, w)

    def fused_forward_rk4_step(self, t, x, delta, dW):
        """One FUSED RK4 forward step (Stratonovich drift ≡ 0): all four
        circulant stencil stages + the RK4 combine in one Pallas program
        (ops/pallas/circulant.py circulant_rk4_step; SURVEY §7 step 8).
        None for the dense-G case — callers fall back to generic stages."""
        if not self.circulant:
            return None
        from sdeflow_tpu.ops.pallas.circulant import circulant_rk4_step

        tc = _tcol(t, x)
        sb3 = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.sqrt(self.beta(tc + s * delta)), (x.shape[0], 1)
                )
                for s in (0.0, 0.5, 1.0)
            ],
            axis=-1,
        )
        return circulant_rk4_step(sb3, x, dW)

    def ijk(self):
        """COO indices of the circulant G (parity with reference IJK(),
        SDEs.py:401-408); None for the dense case."""
        if self.circulant:
            return circulant_ijk(self.dim)
        return None

    # -- forward perturbation --------------------------------------------------
    def sample(self, key, t, y0):
        """y_t | y_0 via the numeric forward solve (reference: SDEs.py:434-436)."""
        return self.sample_scheme(key, t, y0)

    # -- radial latent prior ---------------------------------------------------
    def gen_radial_distribution(self, key, num_samples):
        """Sample radii from the empirical law of ‖y_0‖
        (reference: SDEs.py:438-465). "ecdf" inverts the empirical cdf via
        jnp.quantile; "kde" samples the Gaussian-mixture KDE (with negative
        radii clamped to 0 when no log map)."""
        if self.norm_sampler == "ecdf":
            u = jax.random.uniform(key, (num_samples,))
            # inverse empirical cdf with linear interpolation — identical
            # to jnp.quantile(r_T, u) (r_T is stored sorted by create()),
            # but with no sort inside the compiled program
            n = self.r_T.shape[0]
            r = jnp.interp(u * (n - 1), jnp.arange(n, dtype=u.dtype),
                           self.r_T)
        else:
            r = gaussian_kde_sample(key, self.r_T, self.kde_bandwidth, num_samples)
            if self.norm_map != "log":
                r = jnp.maximum(r, 0.0)
        if self.norm_map == "log":
            r = jnp.exp(r) - _LOG_EPS
        return r[:, None]

    def latent_sample(self, key, num_samples, n):
        """x_0 = r·s with r from the radial prior, s uniform on the sphere
        (reference: SDEs.py:467-493)."""
        key_r, key_s = jax.random.split(key)
        r = self.gen_radial_distribution(key_r, num_samples)
        s = randu_on_sphere(key_s, (num_samples, self.dim))
        return r * s

    def cond_latent_sample(self, key, t, x):
        """Conditional latent y_T | x keeps the data point's own radius
        (reference: SDEs.py:495-501)."""
        r_x = jnp.linalg.norm(x, axis=1, keepdims=True)
        s = randu_on_sphere(key, (x.shape[0], self.dim))
        return r_x * s

    def log_latent_pdf(self, yT):
        """KDE log density of ‖y_T‖ minus the normalizing constant.

        Reproduces the reference exactly (SDEs.py:503-509), including its
        two acknowledged approximations: the missing ‖x‖^{d-1}/S_{d-1}
        surface factor, and — when norm_map == "log" — the KDE being fit on
        log-norms but evaluated at raw norms.
        Returns (B,).
        """
        r = jnp.linalg.norm(yT, axis=1)
        return (
            gaussian_kde_logpdf(r, self.r_T, self.kde_bandwidth) - self.cst_log_dens
        )

    def log_latent_pdf_exact(self, yT):
        """Properly normalized log density of the latent law x = r·s.

        The latent draw is r from the radial KDE law and s uniform on the
        sphere, so the exact density on R^d is

            p(x) = p_r(‖x‖) / (S_{d−1} ‖x‖^{d−1}),   S_{d−1} = 2π^{d/2}/Γ(d/2),

        with, under the log map (u = log(r+ε) is KDE-distributed),
        p_r(r) = p_u(log(r+ε))/(r+ε). Unlike `log_latent_pdf` — which
        reproduces the reference's acknowledged approximations
        (SDEs.py:504-505: missing surface factor, log-map mismatch) — this
        integrates to 1 over R^d, so `eval.nll.exact_logp` yields a true
        normalized likelihood for MSGM; the reference has no normalized
        MSGM likelihood at all. Under the log map it is the exact density
        of the norm_sampler="kde" draw; with norm_map=None the kde draw
        clamps negative radii to 0 (gen_radial_distribution), so this
        density ignores that truncation atom — exact only when the KDE
        places no mass below 0 (training radii ≫ bandwidth, the practical
        case). The default "ecdf" draw is the bandwidth→0 empirical
        counterpart either way. Returns (B,).
        """
        d = float(self.dim)
        r = jnp.linalg.norm(yT, axis=1)
        if self.norm_map == "log":
            u = jnp.log(r + _LOG_EPS)
            log_pr = (
                gaussian_kde_logpdf(u, self.r_T, self.kde_bandwidth)
                - jnp.log(r + _LOG_EPS)
            )
        else:
            log_pr = gaussian_kde_logpdf(r, self.r_T, self.kde_bandwidth)
        log_sphere_area = (
            jnp.log(2.0)
            + 0.5 * d * jnp.log(jnp.pi)
            - jax.scipy.special.gammaln(0.5 * d)
        )
        return log_pr - log_sphere_area - (d - 1.0) * jnp.log(r)

    # -- diagnostics -------------------------------------------------------------
    def beta_G(self):
        """Normalization invariant β_G = −2 tr(L_G)/d; equals 1 after the
        dense normalization and for the circulant G
        (reference: SDEs.py:269-277, 326)."""
        if self.circulant:
            return jnp.ones(())
        return -2.0 * jnp.trace(self.L_G) / self.dim
