"""Shared neural-net primitives for the score networks.

TPU-native counterparts of the reference's `model/nn_utils.py` and the small
helpers in NN.py:

- sinusoidal timestep embedding (reference: model/nn_utils.py:130-148)
- GroupNorm with fp32 statistics (reference GroupNorm32, model/nn_utils.py:39-41)
- zero-initialized output layers (reference zero_module, model/nn_utils.py:151-157)
- the non-learnable NormalizeLogRadius premodule x ↦ (x/‖x‖, log‖x‖)
  (reference: NN.py:56-70)

Gradient checkpointing is `nn.remat` at the call site (the reference rolls a
custom autograd.Function, model/nn_utils.py:8-36 — `jax.checkpoint` is the
native equivalent and composes with jit/scan).

Layout convention: channels-last (NLC / NHWC) throughout — the layout XLA:TPU
prefers — where the torch reference is channels-first.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def normalize_log_radius(x, eps=1e-6):
    """x ↦ (x/‖x‖, log‖x‖), norms over the last axis (reference: NN.py:56-70)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True) + eps
    return x / norm, jnp.log(norm)


def timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal timestep embeddings, [cos | sin] ordering like the
    reference (model/nn_utils.py:130-148). timesteps: (B,) possibly
    fractional; returns (B, dim) float32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def mean_flat(tensor):
    """Mean over all non-batch dimensions (reference: model/nn_utils.py:100-104)."""
    return tensor.mean(axis=tuple(range(1, tensor.ndim)))


def zero_init():
    """Initializer for zero-initialized output convs/denses
    (reference zero_module)."""
    return nn.initializers.zeros


class GroupNorm32(nn.Module):
    """GroupNorm over min(32, C) groups with statistics computed in fp32,
    optionally fused with the following SiLU
    (reference: model/nn_utils.py:39-46, 107-114). Channels-last; the
    compute is the fused Pallas kernel on TPU (jnp path under autodiff /
    off-TPU), see ops/pallas/groupnorm.py.

    When min(32, C) does not divide C (possible at U-Net skip concats with
    small base widths; torch's GroupNorm would reject such configs just like
    flax's) we fall back to the largest divisor of C that is ≤ 32 — identical
    to the reference on every configuration the reference can instantiate.
    """

    channels: int
    silu: bool = False

    @nn.compact
    def __call__(self, x):
        from sdeflow_tpu.ops.pallas.groupnorm import group_norm_silu

        groups = min(self.channels, 32)
        while self.channels % groups != 0:
            groups -= 1
        scale = self.param("scale", nn.initializers.ones, (self.channels,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        shape = x.shape
        h = group_norm_silu(
            x.reshape(shape[0], -1, shape[-1]), scale, bias, groups, self.silu
        )
        return h.reshape(shape)


class TimeMLP(nn.Module):
    """Two-layer time/scale embedding MLP: Dense → act → Dense
    (reference: model/unet.py:339-343, NNUnet1D.py:53-57)."""

    emb_dim: int
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        act = {"silu": nn.silu, "gelu": nn.gelu}[self.act]
        h = nn.Dense(self.emb_dim, dtype=self.dtype, name="dense0")(h)
        h = act(h)
        return nn.Dense(self.emb_dim, dtype=self.dtype, name="dense1")(h)
