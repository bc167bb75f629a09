"""2D-image score net over the flat (B, d) API: the VorticityUNet wrapper.

TPU-native rewrite of the reference's `NNUnet.py`: keeps the uniform
``net(x: (B, d), t: (B,)) -> (B, d)`` call signature over an ADM `UNetModel`,
with flat↔image reshapes (C or F order), a /5 value rescale, and optional
NormalizeLogRadius preprocessing whose log‖x‖ is sinusoidally embedded and
added to the time embedding (reference: NNUnet.py:80-142, 145-246).
Images are channels-last (B, H, W, 1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sdeflow_tpu.models.common import normalize_log_radius, timestep_embedding
from sdeflow_tpu.models.unet2d import UNetModel

SCALE_IMAGE = 5.0  # reference: NNUnet.py:19


def flat_to_img(x, H, W, order="C"):
    """(B, d=H·W) -> (B, H, W, 1), rescaled by 1/5 (reference: NNUnet.py:26-51).

    order "F" means the flat vector was column-major (fastest index runs down
    a column), matching the reference's view+transpose."""
    B, d = x.shape
    assert d == H * W, f"Expected d={H*W}, got {d}"
    x = x / SCALE_IMAGE
    if order == "C":
        img = x.reshape(B, H, W)
    else:
        img = jnp.transpose(x.reshape(B, W, H), (0, 2, 1))
    return img[..., None]


def img_to_flat(y, order="C"):
    """(B, H, W, 1) -> (B, H·W), rescaled by 5 (reference: NNUnet.py:53-77)."""
    B, H, W, C = y.shape
    assert C == 1, f"Expected 1 channel, got {C}"
    y = SCALE_IMAGE * y[..., 0]
    if order == "C":
        return y.reshape(B, H * W)
    return jnp.transpose(y, (0, 2, 1)).reshape(B, H * W)


class VorticityUNet(nn.Module):
    """Flat-vector wrapper around the attention U-Net.

    premodule:
      None                  -> raw x, time-only conditioning
      "NormalizeLogRadius"  -> x/‖x‖·√d, time + log‖x‖ conditioning
    (reference: NNUnet.py:145-245)
    """

    base_channels: int = 32
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    dropout: float = 0.0
    premodule: Optional[str] = None
    in_space: int = 16
    attention_resolutions: Tuple[int, ...] = (2, 4)
    conv_resample: bool = True
    num_heads: int = 1
    use_checkpoint: bool = False
    learn_potential: bool = False
    flatten_order: str = "C"
    dtype: jnp.dtype = jnp.float32
    fp32_head: bool = True  # see models/mlp.py
    # attention backend ("auto" single-chip | "ring" sequence-parallel over
    # mesh's seq_axis — the SURVEY §5 long-context multi-chip leg)
    attention_impl: str = "auto"
    mesh: Optional[object] = None
    seq_axis: str = "model"

    def _core(self):
        return UNetModel(
            in_channels=1,
            model_channels=self.base_channels,
            out_channels=1,
            in_space=self.in_space,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            dropout=self.dropout,
            channel_mult=tuple(self.channel_mults),
            conv_resample=self.conv_resample,
            dims=2,
            num_classes=None,
            use_checkpoint=self.use_checkpoint,
            num_heads=self.num_heads,
            use_scale_shift_norm=False,
            learn_potential=self.learn_potential,
            dtype=self.dtype,
            fp32_head=self.fp32_head,
            attention_impl=self.attention_impl,
            mesh=self.mesh,
            seq_axis=self.seq_axis,
            name="core",
        )

    @nn.compact
    def __call__(self, x, t, deterministic=True):
        """x: (B, d=H·W) or (B, H, W, 1); t: (B,) or (B,1)."""
        assert self.premodule in (None, "NormalizeLogRadius")
        assert self.flatten_order in ("C", "F")
        t = jnp.reshape(t, (-1,))

        extra_emb = None
        if self.premodule == "NormalizeLogRadius":
            flat = x if x.ndim == 2 else x.reshape(x.shape[0], -1)
            flat, log_norm = normalize_log_radius(flat)
            # rescale to keep per-pixel std consistent (reference NNUnet.py:205)
            flat = flat * jnp.sqrt(jnp.asarray(flat.shape[-1], flat.dtype))
            x = flat if x.ndim == 2 else flat.reshape(x.shape)
            # sinusoidally embed log‖x‖ and mirror the time-embedding MLP
            # (reference UNetModelWithLogNorm, NNUnet.py:80-106)
            emb_in = timestep_embedding(log_norm.reshape(-1), self.base_channels)
            time_embed_dim = self.base_channels * 4
            se = nn.Dense(time_embed_dim, name="scale_embed_0")(emb_in)
            se = nn.silu(se)
            extra_emb = nn.Dense(time_embed_dim, name="scale_embed_1")(se)

        need_flat = False
        if x.ndim == 2:
            H = W = self.in_space
            x_img = flat_to_img(x, H, W, order=self.flatten_order)
            need_flat = True
        elif x.ndim == 4:
            assert x.shape[-1] == 1, f"Expected (B,H,W,1), got {x.shape}"
            x_img = x / SCALE_IMAGE
        else:
            raise ValueError(f"Unexpected input shape {x.shape}")

        core = self._core()
        if self.learn_potential:
            # score = ∇ of the scalar potential w.r.t. the (rescaled) image,
            # exactly the reference's parameterization (the flat↔image /5
            # rescales are part of the score net, not differentiated through;
            # NNUnet.py:120-142). nn.grad is linen's lifted jax.grad, so the
            # core shares this module's parameter scope.
            (y_img,) = nn.grad(
                lambda mdl, xi: mdl(
                    xi,
                    t,
                    extra_emb=extra_emb,
                    deterministic=deterministic,
                    potential_only=True,
                ),
                core,
                x_img,
            )
        else:
            y_img = core(x_img, t, extra_emb=extra_emb, deterministic=deterministic)

        if need_flat:
            return img_to_flat(y_img, order=self.flatten_order)
        return y_img * SCALE_IMAGE
