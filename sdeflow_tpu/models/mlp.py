"""MLP score network (reference: NN.py:73-120).

4 Dense layers (hidden 128) with Swish; input is concat(x, t) or, with the
NormalizeLogRadius premodule, concat(x/‖x‖, log‖x‖, t). All matmuls are
(B, hidden)×(hidden, hidden) — batched MXU work; Swish fuses into them under
XLA. Uniform call signature: net(x: (B, d), t: (B,)) -> (B, d).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sdeflow_tpu.models.common import normalize_log_radius


class MLP(nn.Module):
    input_dim: int = 2
    index_dim: int = 1
    hidden_dim: int = 128
    premodule: Optional[str] = None  # None | "NormalizeLogRadius"
    dtype: jnp.dtype = jnp.float32
    # compute the output projection in fp32 even under a bf16 compute
    # dtype (standard mixed-precision practice): the score magnitude grows
    # like 1/std(t) near t_epsilon, so head rounding perturbs the drift
    # directly — quality effect measured in BF16_ABLATION{,_bf16head}.json.
    # No-op when dtype is fp32.
    fp32_head: bool = True

    @nn.compact
    def __call__(self, x, t):
        assert self.premodule in (None, "NormalizeLogRadius")
        sz = x.shape
        x = x.reshape(-1, self.input_dim)
        t = jnp.reshape(t, (-1, self.index_dim)).astype(x.dtype)

        if self.premodule == "NormalizeLogRadius":
            h, log_norm = normalize_log_radius(x)
            x = jnp.concatenate([h, log_norm], axis=-1)
        h = jnp.concatenate([x, t], axis=1)

        h = h.astype(self.dtype)
        for i in range(3):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"dense{i}")(h)
            h = nn.swish(h)
        head_dtype = jnp.float32 if self.fp32_head else self.dtype
        out = nn.Dense(self.input_dim, dtype=head_dtype, name="dense_out")(h)
        return out.astype(jnp.float32).reshape(sz)
