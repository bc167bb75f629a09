"""1D conv U-Net score network for flat d-dim signals (d ~ 100–1000).

TPU-native rewrite of the reference's `UNet1D` (reference: NNUnet1D.py:27-179):
time embedding via a 2-layer GELU MLP on the raw scalar t, an optional
log-norm scale embedding added to it (with the input rescaled by √L), and an
encoder/decoder of ConvBlock1D pairs with the time embedding concatenated as
extra channels at every stage. Layout is channels-last (B, L, C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sdeflow_tpu.models.common import normalize_log_radius, TimeMLP


class ConvBlock1D(nn.Module):
    """[Conv3 → GELU] × 2 (reference: NNUnet1D.py:13-24)."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3,), padding="SAME", dtype=self.dtype,
                    name="conv0")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.out_ch, (3,), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        return nn.gelu(x)


class UNet1D(nn.Module):
    input_dim: int
    base_channels: int = 32
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2  # kept for API symmetry with the reference
    premodule: Optional[str] = None  # None | "NormalizeLogRadius"
    emb_dim: int = 128
    # compute dtype for convs/denses (bfloat16 feeds the MXU natively;
    # params stay float32 — flax casts per-op). Norm statistics in the
    # premodule stay fp32 regardless (computed before the cast).
    dtype: jnp.dtype = jnp.float32
    # fp32 output projection under a bf16 compute dtype (the score grows
    # like 1/std(t) near t_epsilon — see models/mlp.py); no-op for fp32
    fp32_head: bool = True

    @nn.compact
    def __call__(self, x, t):
        """x: (B, L) or (B, L, 1); t: (B,) or (B, 1). Returns (B, L)."""
        assert self.premodule in (None, "NormalizeLogRadius")
        if x.ndim == 2:
            x = x[..., None]  # (B, L, 1)
        t = jnp.reshape(t, (-1, 1)).astype(jnp.float32)

        t_emb = TimeMLP(self.emb_dim, act="gelu", dtype=self.dtype,
                        name="time_mlp")(t)  # (B, E)

        if self.premodule == "NormalizeLogRadius":
            # norms over the full signal (reference normalizes over the last
            # axis of the (B, 1, L) layout, i.e. over L: NNUnet1D.py:131)
            flat, log_norm = normalize_log_radius(x.reshape(x.shape[0], -1))
            x = flat.reshape(x.shape)
            # rescale so per-entry std is length-independent (NNUnet1D.py:134)
            x = x * jnp.sqrt(jnp.asarray(x.shape[1], x.dtype))
            scale_vec = TimeMLP(self.emb_dim, act="gelu", dtype=self.dtype,
                                name="scale_embed")(log_norm.reshape(-1, 1))
            t_emb = t_emb + scale_vec
        x = x.astype(self.dtype)

        def with_emb(h):
            # concat the time embedding as channels at every spatial position
            e = jnp.broadcast_to(
                t_emb[:, None, :], (h.shape[0], h.shape[1], t_emb.shape[-1])
            )
            return jnp.concatenate([h, e], axis=-1)

        chs = [self.base_channels * m for m in self.channel_mults]

        # -------- encoder (NNUnet1D.py:74-86, 154-159) --------
        skips = []
        h = x
        for i, out_ch in enumerate(chs):
            h = ConvBlock1D(out_ch, dtype=self.dtype, name=f"enc{i}")(with_emb(h))
            skips.append(h)
            h = nn.Conv(
                out_ch, (4,), strides=(2,), padding=((1, 1),),
                dtype=self.dtype, name=f"down{i}"
            )(h)

        # -------- bottleneck (NNUnet1D.py:90, 162-163) --------
        h = ConvBlock1D(chs[-1], dtype=self.dtype, name="middle")(with_emb(h))

        # -------- decoder (NNUnet1D.py:93-104, 166-176) --------
        for i, out_ch in enumerate(reversed(chs)):
            h = nn.ConvTranspose(
                out_ch, (4,), strides=(2,), padding="SAME",
                dtype=self.dtype, name=f"up{i}"
            )(h)
            skip = skips.pop()
            if h.shape[1] != skip.shape[1]:  # odd-length pad fix
                pad = skip.shape[1] - h.shape[1]
                h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
            h = ConvBlock1D(out_ch, dtype=self.dtype, name=f"dec{i}")(
                with_emb(jnp.concatenate([h, skip], axis=-1))
            )

        head_dtype = jnp.float32 if self.fp32_head else self.dtype
        out = nn.Conv(1, (1,), dtype=head_dtype, name="final")(h)  # (B, L, 1)
        return out[..., 0]
