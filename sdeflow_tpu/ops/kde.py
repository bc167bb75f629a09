"""On-device 1-D Gaussian kernel density estimation.

Replaces the reference's host-side sklearn ``KernelDensity`` round-trips
(reference: SDEs.py:239-240, 444, 503-509) with ~20 lines of jnp: a Gaussian
KDE is a uniform mixture of N Gaussians centered at the data points, so the
log-density is a logsumexp over centers and sampling is
``center[randint] + bandwidth · ε``. Everything stays on device.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def gaussian_kde_logpdf(x, centers, bandwidth):
    """log density of a Gaussian KDE at points x.

    Args:
      x: (M,) query points.
      centers: (N,) KDE centers (the training norms r_T).
      bandwidth: scalar kernel bandwidth (reference uses 0.1·std(r_T),
        SDEs.py:239).
    Returns: (M,) log densities — matches sklearn's
      KernelDensity(kernel="gaussian").score_samples.
    """
    x = jnp.asarray(x)
    z = (x[:, None] - centers[None, :]) / bandwidth
    log_kernel = -0.5 * z**2 - LOG_SQRT_2PI - jnp.log(bandwidth)
    return jax.scipy.special.logsumexp(log_kernel, axis=1) - jnp.log(centers.shape[0])


def gaussian_kde_sample(key, centers, bandwidth, num_samples):
    """Draw from the KDE mixture: pick a center, add bandwidth·ε."""
    key_idx, key_eps = jax.random.split(key)
    idx = jax.random.randint(key_idx, (num_samples,), 0, centers.shape[0])
    eps = jax.random.normal(key_eps, (num_samples,), dtype=centers.dtype)
    return centers[idx] + bandwidth * eps


def kde_normalization_log_constant(centers, bandwidth, num_grid=1000):
    """log ∫ KDE density over [min(centers), max(centers)] by Riemann sum.

    Mirrors the reference's `cst_log_dens` estimate (SDEs.py:258-267),
    including its left-endpoint quadrature on a 1000-point linspace.
    """
    r = jnp.linspace(jnp.min(centers), jnp.max(centers), num_grid)
    dens = jnp.exp(gaussian_kde_logpdf(r, centers, bandwidth))
    dr = r[1] - r[0]
    return jnp.log(jnp.sum(dens) * dr)
