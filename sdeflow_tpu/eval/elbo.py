"""ELBO evaluation (reference: NN.py:123-128).

Single implementation of the evaluation step; training's `make_eval_step`
wraps it in a fresh per-Trainer `jax.jit` (a module-level jit would retain
one compiled executable per score-net closure for the life of a sweep —
each arm builds a new model, so the global cache would only ever grow).
"""

from __future__ import annotations

import jax.numpy as jnp


def evaluate(gen_sde, key, x_test):
    """Mean ± stderr of the ELBO over a test batch.

    stderr is over the TEST BATCH size like the reference (NN.py:126-128),
    not over the intT-expanded S'·B evaluation count.
    """
    elbo = gen_sde.elbo_random_t_slice(key, x_test)
    n = x_test.shape[0]
    return elbo.mean(), elbo.std() / jnp.sqrt(jnp.asarray(n, elbo.dtype))
