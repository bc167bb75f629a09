"""Hutchinson probe vectors and the JVP divergence estimator.

The reference estimates div(mu) with v ~ probe and a VJP
`autograd.grad(mu_to_div, y, v)·v` (reference: SDEs.py:514-536, 637-642).
On TPU we use forward-mode `jax.jvp` instead: vᵀJv = v · (J v), which is a
single extra forward pass, avoids the grad-of-grad graph when the loss is
differentiated w.r.t. the network parameters, and nests cleanly under
`jax.grad`/`jax.vjp`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_rademacher(key, shape, dtype=jnp.float32):
    """±1 with equal probability (reference: SDEs.py:514-515)."""
    return (jax.random.uniform(key, shape) >= 0.5).astype(dtype) * 2.0 - 1.0


def sample_gaussian(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def randu_on_sphere(key, shape, dtype=jnp.float32):
    """Uniform on S^{d-1}: normalized Gaussian (reference: SDEs.py:520-526)."""
    x = jax.random.normal(key, shape, dtype=dtype)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def sample_v(key, shape, vtype="rademacher", dtype=jnp.float32):
    """(reference: SDEs.py:528-536)"""
    if vtype == "rademacher":
        return sample_rademacher(key, shape, dtype)
    if vtype in ("normal", "gaussian"):
        return sample_gaussian(key, shape, dtype)
    if vtype == "uniform":
        return randu_on_sphere(key, shape, dtype)
    raise ValueError(f"vtype {vtype} not supported")


def hutchinson_div(fn, y, v, has_aux=False):
    """Estimate vᵀ (∂fn/∂y) v with one forward-mode JVP.

    Args:
      fn: y -> (B, d) field (or (field, aux) when has_aux).
      y:  (B, d) evaluation point.
      v:  (B, d) probe.
    Returns:
      (est, primal[, aux]) where est is (B,) = Σ_d v·(Jv) and primal = fn(y).
    """
    if has_aux:
        (primal, aux), (tangent, _) = jax.jvp(fn, (y,), (v,))
        est = jnp.sum(tangent * v, axis=tuple(range(1, v.ndim)))
        return est, primal, aux
    primal, tangent = jax.jvp(fn, (y,), (v,))
    est = jnp.sum(tangent * v, axis=tuple(range(1, v.ndim)))
    return est, primal
