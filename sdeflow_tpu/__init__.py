"""sdeflow_tpu — TPU-native score-based / multiplicative-score generative modeling.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the MSGM/SGM
reference codebase (vressegu/sdeflow-light):

- additive (variance-preserving, "SGM") and multiplicative-noise ("MSGM")
  forward SDEs (`sdeflow_tpu.sde`),
- stochastic integrators (Euler–Maruyama / Heun / RK4-Stratonovich) compiled
  to single `jax.lax.scan` XLA programs (`sdeflow_tpu.ops.integrators`),
- the plug-in reverse SDE with a sliced/implicit score matching (SSM) loss
  using a Hutchinson divergence estimator (`sdeflow_tpu.sde.reverse`),
- MLP and 1D/2D U-Net score networks (`sdeflow_tpu.models`),
- on-device evaluation: MMD, sliced Wasserstein, ELBO, survival tails
  (`sdeflow_tpu.eval`),
- data pipelines mirroring the reference's synthetic + geophysical samplers
  (`sdeflow_tpu.data`),
- data-parallel sharding over a `jax.sharding.Mesh` (`sdeflow_tpu.parallel`),
- experiment drivers reproducing the reference's SGM-vs-MSGM sweeps
  (`sdeflow_tpu.experiments`).

Everything is designed TPU-first: pure-functional pytree SDE definitions,
static shapes, `lax.scan` control flow, fused elementwise work around MXU
matmuls, and Pallas kernels for the hot inner ops.
"""

__version__ = "0.1.0"

from sdeflow_tpu.sde.base import beta_linear
from sdeflow_tpu.sde.sgm import SGMSde
from sdeflow_tpu.sde.msgm import MSGMSde
from sdeflow_tpu.sde.reverse import PluginReverseSDE
from sdeflow_tpu.ops.integrators import (
    euler_maruyama_sampler,
    heun_sampler,
    rk4_stratonovich_sampler,
    integrate_sde,
)
from sdeflow_tpu.ops.ode import encode_ode, integrate_ode

__all__ = [
    "beta_linear",
    "SGMSde",
    "MSGMSde",
    "PluginReverseSDE",
    "euler_maruyama_sampler",
    "heun_sampler",
    "rk4_stratonovich_sampler",
    "integrate_sde",
    "encode_ode",
    "integrate_ode",
]
