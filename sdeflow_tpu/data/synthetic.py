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
