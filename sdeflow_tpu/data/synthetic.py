"""Synthetic distribution samplers (pure jnp, explicit PRNG keys).

TPU-native counterparts of the reference's synthetic samplers
(reference: data.py:702-803). Uniform duck-typed API, like the reference's:
  .sample(key, n) -> (n, d) float32
  .sampletest(key, n) -> (n, d) float32
  .dim, .name, and optional .get_std()
but with explicit keys instead of global torch/numpy RNG state, so batches
can be generated inside jitted/sharded programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SwissRoll:
    """Swiss roll, 2D slice [x, z]/5 with injected thickness noise
    (reference: data.py:702-717, which calls sklearn make_swiss_roll — the
    generative formula is t = 1.5π(1 + 2u), (x, z) = (t·cos t, t·sin t))."""

    def __init__(self):
        self.dim = 2
        self.name = "swiss"

    def sample(self, key, n, noise=0.5):
        key_t, key_n = jax.random.split(key)
        t = 1.5 * jnp.pi * (1 + 2 * jax.random.uniform(key_t, (n,)))
        x = jnp.stack([t * jnp.cos(t), t * jnp.sin(t)], axis=1)
        x = x + noise * jax.random.normal(key_n, (n, 2))
        return (x / 5.0).astype(jnp.float32)

    def sampletest(self, key, n, noise=0.5):
        return self.sample(key, n, noise)


class Gaussian:
    """Correlated multi-dimensional Gaussian x = ε Aᵀ
    (reference: data.py:751-778)."""

    def __init__(self, key, dim=2, correlation=True, normalized=False):
        self.dim = dim
        self.name = f"gaussian{dim}"
        if correlation:
            self.A = jax.random.normal(key, (dim, dim))
            self.name += "cor"
        else:
            self.A = jnp.eye(dim)
        cov = self.A @ self.A.T
        self.std = jnp.sqrt(jnp.diag(cov))
        if normalized:
            self.name += "_norm"
            self.A = jnp.diag(1.0 / self.std) @ self.A

    def sample(self, key, n):
        return (jax.random.normal(key, (n, self.dim)) @ self.A.T).astype(jnp.float32)

    def sampletest(self, key, n):
        return self.sample(key, n)

    def get_std(self):
        return self.std


class Cauchy:
    """Heavy-tailed multi-dimensional Cauchy, scale 1/50, optional
    correlation (reference: data.py:719-748)."""

    def __init__(self, key, dim=2, correlation=False, normalized=False):
        self.dim = dim
        self.name = f"cauchy{dim}"
        if correlation:
            self.A = jax.random.normal(key, (dim, dim))
            self.name += "cor"
        else:
            self.A = jnp.eye(dim)
        cov = self.A @ self.A.T
        self.std = jnp.sqrt(jnp.diag(cov))
        if normalized:
            self.name += "_norm"
            self.A = jnp.diag(1.0 / self.std) @ self.A
        self.scale = 1.0 / 50

    def sample(self, key, n):
        c = jax.random.cauchy(key, (n, self.dim)) * self.scale
        return (c @ self.A.T).astype(jnp.float32)

    def sampletest(self, key, n):
        return self.sample(key, n)

    def get_std(self):
        return self.std


def grf_spectral_filter(npixel: int, ell: float = 2.0):
    """Real-FFT spectral filter for a periodic smoothed Gaussian random
    field, plus the normalization that gives unit pixel variance.

    Returns (filt, norm) as plain numpy arrays so the same constants drive
    both the jnp sampler below and the numpy/torch twin used to feed the
    PyTorch reference in the image parity study (tools/parity_image_*.py).
    The field is x = irfft2(rfft2(w) · filt) / norm with w iid N(0,1):
    a stationary Gaussian field with spectrum filt², mimicking the
    reference's smoothed PIV vorticity input (MSGM_higherDim.py:222-259,
    smoothing=2 path in data.py).
    """
    import numpy as np

    k1 = 2.0 * np.pi * np.fft.fftfreq(npixel)  # (H,)
    k2 = 2.0 * np.pi * np.fft.rfftfreq(npixel)  # (W//2+1,)
    ksq = k1[:, None] ** 2 + k2[None, :] ** 2
    filt = np.exp(-0.5 * ell**2 * ksq)
    # Var(x_pixel) = (1/N²)·Σ_k filt(k)² over the FULL (two-sided) spectrum;
    # the rfft grid stores only half, so double the interior columns.
    weights = np.full_like(filt, 2.0)
    weights[:, 0] = 1.0
    if npixel % 2 == 0:
        weights[:, -1] = 1.0
    var = float((weights * filt**2).sum()) / npixel**2
    return filt.astype("float32"), float(var**0.5)


class SmoothedGRF:
    """Periodic smoothed Gaussian random field on an npixel×npixel grid,
    flattened column-major (order 'F') to (n, npixel²) — a synthetic stand-in
    for the reference's 16×16 PIV vorticity fields (MSGM_higherDim.py:222-259)
    used for image-config quality parity when ../MSGM-data is unavailable.
    Unit pixel variance, smoothing length `ell` in pixels."""

    def __init__(self, npixel=16, ell=2.0):
        self.npixel = int(npixel)
        self.dim = self.npixel**2
        self.name = f"grf{npixel}"
        filt, norm = grf_spectral_filter(self.npixel, ell)
        self.filt = jnp.asarray(filt)
        self.norm = norm

    def _fields(self, key, n):
        w = jax.random.normal(key, (n, self.npixel, self.npixel))
        x = jnp.fft.irfft2(jnp.fft.rfft2(w) * self.filt, s=(self.npixel,) * 2)
        return x / self.norm

    def sample(self, key, n):
        x = self._fields(key, n)
        # column-major flatten, matching the reference pipeline's order="F"
        return jnp.transpose(x, (0, 2, 1)).reshape(n, self.dim).astype(jnp.float32)

    def sampletest(self, key, n):
        return self.sample(jax.random.fold_in(key, 0x7E57), n)

    def get_std(self):
        return jnp.ones((self.dim,))


class GaussianCauchy:
    """Correlated Gaussian scaled by a SINGLE shared scalar Cauchy draw per
    batch (reference: data.py:780-803 — note the (1,1) Cauchy sample shared
    across the whole batch)."""

    def __init__(self, key, dim=2, correlation=True, normalized=False):
        self.gaussian = Gaussian(key, dim, correlation, normalized)
        self.dim = dim
        self.name = f"gaussianCauchy{dim}"
        if correlation:
            self.name += "cor"
        if normalized:
            self.name += "_norm"

    def get_std(self):
        return self.gaussian.std

    def sample(self, key, n):
        key_g, key_c = jax.random.split(key)
        scalar = jax.random.cauchy(key_c, (1, 1))
        return ((1.0 / 50) * self.gaussian.sample(key_g, n) * scalar).astype(
            jnp.float32
        )

    def sampletest(self, key, n):
        return self.sample(key, n)
