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

    def rk4_step(self, t, x, delta, dW, lmbd=0.0):
        """One RK4 step; when the base SDE exposes a fused whole-step kernel
        (circulant MSGM: fused_forward_rk4_step, all four stencil stages +
        combine in one Pallas program) use it, else the generic stages."""
        fused = getattr(self.base_sde, "fused_forward_rk4_step", None)
        if fused is not None:
            out = fused(t, x, delta, dW)
            if out is not None:
                return out
        from sdeflow_tpu.ops.integrators import rk4_step as generic_rk4

        return generic_rk4(self, t, x, delta, dW, lmbd)
