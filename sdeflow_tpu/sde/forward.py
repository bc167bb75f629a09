"""Forward (noising) flow adapter.

Wraps a base SDE into the flow protocol the integrators expect, for the
noising direction (reference: SDEs.py:30-47):
  Itô drift        mu        = f_strato + ½ div Σ
  Stratonovich     mu_strato = f_strato
  diffusion action sigma     = g
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ForwardFlow:
    base_sde: object
    T: jnp.ndarray

    def mu(self, t, y, lmbd=0.0):
        return self.base_sde.f_strato(t, y) + 0.5 * self.base_sde.div_sigma(t, y)

    def mu_strato(self, t, y, lmbd=0.0):
        return self.base_sde.f_strato(t, y)

    def sigma_apply(self, t, y, w, lmbd=0.0):
        return self.base_sde.sigma_apply(t, y, w)
