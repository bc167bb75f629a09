"""ELBO evaluation (reference: NN.py:123-128)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def evaluate(gen_sde, key, x_test):
    """Mean ± stderr of the ELBO over a test batch."""
    elbo = gen_sde.elbo_random_t_slice(key, x_test)
    n = x_test.shape[0]
    return elbo.mean(), elbo.std() / jnp.sqrt(jnp.asarray(n, elbo.dtype))
