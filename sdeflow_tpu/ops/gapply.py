"""Multiplicative-noise tensor G: construction and application.

The MSGM diffusion operator is g(t,y)·w = √β(t) · Σ_{j,k} G[i,j,k] y_j w_k,
with each slice G[:,:,k] skew-symmetric so the Stratonovich flow preserves
‖y‖ (reference: SDEs.py:221-246, 315-399).

TPU-first design decisions:
- The diffusion is only ever exposed as an *action* on a vector
  (``sigma_apply``), never materialized as a (B, d, d) matrix as the
  reference does via einsum('ijk,bj->bik') (SDEs.py:432) — one fused einsum
  instead, which XLA maps to the MXU.
- The "sparse" circulant G of the reference (2 nonzeros per slice, COO
  indices + scatter_add, SDEs.py:369-399 / sde_scheme.py:27-32) is
  implemented *structurally* as a jnp.roll stencil: O(d) work, no scatters,
  perfectly vectorized on the VPU. The COO indices are still exported
  (``circulant_ijk``) for parity/debug.

Sign convention note: the reference's sparse branch returns Itô drift
+½β·y and stores L_G = +½I (SDEs.py:251, 413), which is inconsistent with
its own dense branch, where L_G = ½Σ_k G_k G_k is negative-definite and
equals −½I for this circulant G (SDEs.py:246, 410-415). The inconsistency is
latent in the reference because all its samplers use the Stratonovich drift
(= 0) and the SSM loss target `mu_to_div` cancels f exactly
(SDEs.py:631-632). We use the mathematically consistent sign (−½β·y)
everywhere.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# circulant slice coefficient: F[k, k+1] = c, F[k+1, k] = -c with c = √2/2,
# chosen so tr(L_G) = -d/2 without further normalization
# (reference: SDEs.py:375-380)
CIRCULANT_COEF = math.sqrt(2.0) / 2.0


def make_dense_G(key, n, dtype=jnp.float32):
    """Random dense skew-symmetric-sliced G, normalized so tr(L_G) = −n/2.

    Returns (G, L_G) with G: (n, n, n), slices G[:,:,k] skew-symmetric, and
    L_G = ½ Σ_k G_k @ G_k the (negative-definite) Itô-correction matrix.
    (reference: SDEs.py:315-341)
    """
    F = jax.random.normal(key, (n, n, n), dtype=dtype)
    G = 0.5 * (F - jnp.transpose(F, (1, 0, 2)))
    L_G = 0.5 * jnp.einsum("ijk,jmk->im", G, G)
    tr_L = jnp.trace(L_G)
    G = jnp.sqrt(-0.5 * n / tr_L) * G
    L_G = 0.5 * jnp.einsum("ijk,jmk->im", G, G)
    return G, L_G


def dense_ito_tensor(G):
    """L_G = ½ Σ_k G_k @ G_k (reference: SDEs.py:246)."""
    return 0.5 * jnp.einsum("ijk,jmk->im", G, G)


def dense_sigma_apply(G, sqrt_beta, y, w):
    """(g·w)_i = √β Σ_{j,k} G[i,j,k] y_j w_k — one fused einsum on the MXU.

    Args:
      G: (d, d, d). sqrt_beta: scalar or (B, 1). y, w: (B, d).
    Returns: (B, d).
    """
    return jnp.einsum("ijk,bj,bk->bi", G, sqrt_beta * y, w)


def circulant_sigma_apply(sqrt_beta, y, w):
    """Circulant-G diffusion action as a roll stencil (no scatter).

    With G[k, (k+1)%d, k] = c and G[(k+1)%d, k, k] = −c (c = √2/2):
      (g·w)_i = √β · c · ( y_{i+1} w_i − y_{i−1} w_{i−1} )
    which is exactly the reference's scatter_add over COO indices
    (sde_scheme.py:27-32) but expressed with two jnp.roll's.
    """
    c = CIRCULANT_COEF
    yb = sqrt_beta * y
    return c * (jnp.roll(yb, -1, axis=-1) * w - jnp.roll(yb * w, 1, axis=-1))


def circulant_ijk(n):
    """COO (I, J, K, V) index/value arrays of the circulant G, for parity
    checks against the reference's sparse representation
    (reference: SDEs.py:369-399)."""
    k = jnp.arange(n, dtype=jnp.int32)
    I = jnp.stack([k, (k + 1) % n], axis=1).reshape(-1)
    J = jnp.stack([(k + 1) % n, k], axis=1).reshape(-1)
    K = jnp.stack([k, k], axis=1).reshape(-1)
    c = jnp.float32(CIRCULANT_COEF)
    V = jnp.tile(jnp.array([c, -c], dtype=jnp.float32), n)
    return I, J, K, V


def circulant_dense(n, dtype=jnp.float32):
    """Materialize the circulant G as a dense (n,n,n) tensor (tests only)."""
    I, J, K, V = circulant_ijk(n)
    G = jnp.zeros((n, n, n), dtype=dtype)
    return G.at[I, J, K].add(V.astype(dtype))
