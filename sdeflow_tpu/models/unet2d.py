"""ADM-style U-Net with attention and timestep embedding.

TPU-native rewrite of the reference's `model/unet.py` (UNetModel, ResBlock,
AttentionBlock/QKVAttention, Upsample/Downsample, ConditionalModel). Design
differences from the torch original:

- channels-last (NHWC) layout — XLA:TPU's preferred conv layout — instead of
  NCHW; convolutions and the qkv projection map straight onto the MXU.
- gradient checkpointing is `nn.remat` on the residual/attention blocks
  (reference: custom CheckpointFunction, model/nn_utils.py:8-36), composing
  with jit and scan.
- `learn_potential` (score = ∇ₓ of a scalar potential, reference
  model/unet.py:492-511) is a plain `jax.grad` of the potential path via
  `potential_score` — no manual autograd bookkeeping or grad zeroing.
- supports dims ∈ {1, 2, 3}, covering the reference's full conv_nd surface
  (model/nn_utils.py:49-97); every spatial op (_kernel, Upsample's repeat +
  odd crop, Downsample, the attention flatten) is rank-generic.

Parity map (reference file:line):
  UNetModel        model/unet.py:276-552
  ResBlock         model/unet.py:101-195
  AttentionBlock   model/unet.py:198-273
  Upsample         model/unet.py:40-72 (nearest×2 + conv, odd-size crop)
  Downsample       model/unet.py:75-98 (stride-2 conv or avg-pool)
  ConditionalModel model/unet.py:555-574
  get_feature_vectors -> __call__(..., return_features=True)
                   model/unet.py:519-552
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdeflow_tpu.models.common import GroupNorm32, timestep_embedding, zero_init


def _kernel(dims, k):
    return (k,) * dims


class Upsample(nn.Module):
    channels: int
    use_conv: bool
    dims: int = 2
    odd_size: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.channels
        for axis in range(1, 1 + self.dims):  # nearest-neighbor ×2
            x = jnp.repeat(x, 2, axis=axis)
        if self.use_conv:
            x = nn.Conv(
                self.channels, _kernel(self.dims, 3), padding="SAME",
                dtype=self.dtype, name="conv"
            )(x)
        if self.odd_size:
            sl = (slice(None),) + (slice(None, -1),) * self.dims + (slice(None),)
            x = x[sl]
        return x


class Downsample(nn.Module):
    channels: int
    use_conv: bool
    dims: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.channels
        if self.use_conv:
            return nn.Conv(
                self.channels,
                _kernel(self.dims, 3),
                strides=_kernel(self.dims, 2),
                padding=((1, 1),) * self.dims,
                dtype=self.dtype,
                name="op",
            )(x)
        return nn.avg_pool(x, _kernel(self.dims, 2), strides=_kernel(self.dims, 2))


class ResBlock(nn.Module):
    """Residual block conditioned on a timestep embedding
    (reference: model/unet.py:101-195). `deterministic` is a module field so
    the call signature stays array-only (remat-friendly)."""

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    dims: int = 2
    no_bias_last_layer: bool = False
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels

        h = GroupNorm32(self.channels, silu=True, name="in_norm")(x)
        h = nn.Conv(out_ch, _kernel(self.dims, 3), padding="SAME",
                    dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_dense"
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out.reshape(emb_out.shape[0], *([1] * self.dims), -1)

        if self.use_scale_shift_norm:
            # affine from the embedding sits between norm and SiLU — not fusable
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(out_ch, name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(out_ch, silu=True, name="out_norm")(h)
        h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = nn.Conv(
            out_ch,
            _kernel(self.dims, 3),
            padding="SAME",
            kernel_init=zero_init(),
            bias_init=zero_init(),
            use_bias=not self.no_bias_last_layer,
            dtype=self.dtype,
            name="out_conv",
        )(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(
                out_ch, _kernel(self.dims, 3), padding="SAME",
                dtype=self.dtype, name="skip_conv"
            )(x)
        else:
            skip = nn.Conv(
                out_ch,
                _kernel(self.dims, 1),
                use_bias=not self.no_bias_last_layer,
                dtype=self.dtype,
                name="skip_conv",
            )(x)
        return skip + h


class _DenseParams(nn.Module):
    """Param holder with nn.Dense's exact param names, shapes, dtypes and
    initializers — created at the same scope path as the Dense it replaces,
    so the param TREE AND INIT VALUES are identical (linen derives each
    param's init RNG from its scope path + name). Lets the fused
    AttentionBlock kernel consume raw weights without changing checkpoints,
    TP sharding rules, or tests."""

    in_features: int
    features: int
    kernel_init: object = None
    bias_init: object = None

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            self.kernel_init or nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", self.bias_init or nn.initializers.zeros,
            (self.features,), jnp.float32,
        )
        return kernel, bias


class _GNParams(nn.Module):
    """GroupNorm32's params (scale ones, bias zeros) as a holder."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.channels,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        return scale, bias


class AttentionBlock(nn.Module):
    """Spatial self-attention over the flattened feature map
    (reference: model/unet.py:198-250). The √√c scaling is applied to q and k
    before the matmul for low-precision stability, like the reference; the
    softmax accumulates in fp32.

    attention_impl:
      "auto"    -> heads 1-8 route the WHOLE block (GroupNorm → qkv →
                   core → proj → residual) through one fused Pallas
                   program on the no-grad TPU path (ops/pallas/attnblock.py
                   — the roofline showed ~10 XLA ops' worth of HBM round
                   trips per block; heads via a static in-kernel loop);
                   autodiff and heads>8 use the identical unfused
                   composition (flash Pallas above the length threshold).
      "unfused" -> always the module-by-module composition.
      "ring"    -> sequence-parallel exact attention with the flattened
                   spatial axis sharded over `mesh`'s `seq_axis` ring
                   (parallel/ring.py); requires mesh and T divisible by the
                   axis size.
    All three create the identical parameter tree.
    """

    channels: int
    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    mesh: Optional[object] = None
    seq_axis: str = "model"

    @nn.compact
    def __call__(self, x):
        b, *spatial, c = x.shape
        assert c == self.channels and c % self.num_heads == 0
        t = 1
        for s in spatial:
            t *= s
        from sdeflow_tpu.ops.pallas.attention import attention_core

        x_flat = x.reshape(b, t, c)

        if self.attention_impl == "auto" and self.num_heads <= 8:
            # fused whole-block path: raw params from path-identical holders
            from sdeflow_tpu.ops.pallas.attnblock import fused_attention_block

            groups = min(c, 32)
            while c % groups != 0:
                groups -= 1
            gn_scale, gn_bias = _GNParams(c, name="norm")()
            wqkv, bqkv = _DenseParams(c, 3 * c, name="qkv")()
            wproj, bproj = _DenseParams(
                c, c, kernel_init=zero_init(), bias_init=zero_init(),
                name="proj_out",
            )()
            out = fused_attention_block(
                x_flat, gn_scale, gn_bias, wqkv, bqkv, wproj, bproj, groups,
                self.num_heads,
            )
            return out.reshape(b, *spatial, c)

        h = GroupNorm32(c, name="norm")(x_flat)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)  # 1×1 conv ≡ Dense over channels
        if self.attention_impl == "ring":
            if self.mesh is None:
                raise ValueError('attention_impl="ring" requires a mesh')
            from sdeflow_tpu.parallel.ring import ring_attention

            out = ring_attention(qkv, self.num_heads, self.mesh,
                                 axis=self.seq_axis)
        else:
            out = attention_core(qkv, self.num_heads)  # fused Pallas core
        out = nn.Dense(
            c, kernel_init=zero_init(), bias_init=zero_init(),
            dtype=self.dtype, name="proj_out"
        )(out)
        return (x_flat + out).reshape(b, *spatial, c)


class UNetModel(nn.Module):
    """The full U-Net with attention and timestep embedding
    (reference: model/unet.py:276-552). Channels-last: x is
    (B, *spatial, in_channels); timesteps is (B,).

    Static call modes (one compact method; unused branches create no params):
      __call__(..., potential_only=True)  -> scalar potential (middle mean)
      __call__(..., return_features=True) -> dict(down/middle/up/out)
    """

    in_channels: int
    model_channels: int
    out_channels: int
    in_space: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    learn_potential: bool = False
    # compute dtype for convs/denses (bfloat16 feeds the MXU natively;
    # GroupNorm statistics always stay fp32, and the model output is fp32)
    dtype: jnp.dtype = jnp.float32
    # fp32 output conv under a bf16 compute dtype (the score grows like
    # 1/std(t) near t_epsilon — see models/mlp.py); no-op for fp32
    fp32_head: bool = True
    # attention backend for every AttentionBlock: "auto" (single-chip fused
    # core) or "ring" (sequence-parallel over mesh's seq_axis)
    attention_impl: str = "auto"
    mesh: Optional[object] = None
    seq_axis: str = "model"

    def _res_block(self, name, deterministic, **kw):
        cls = nn.remat(ResBlock) if self.use_checkpoint else ResBlock
        return cls(
            dims=self.dims,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            deterministic=deterministic,
            dtype=self.dtype,
            name=name,
            **kw,
        )

    def _attn_block(self, ch, heads, name):
        cls = nn.remat(AttentionBlock) if self.use_checkpoint else AttentionBlock
        return cls(
            channels=ch, num_heads=heads, dtype=self.dtype,
            attention_impl=self.attention_impl, mesh=self.mesh,
            seq_axis=self.seq_axis, name=name,
        )

    @nn.compact
    def __call__(
        self,
        x,
        timesteps,
        y=None,
        extra_emb=None,
        deterministic=True,
        potential_only=False,
        return_features=False,
    ):
        time_embed_dim = self.model_channels * 4
        num_heads_up = (
            self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        )

        # --- embedding (reference model/unet.py:338-346, 469-473) ---
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_1")(emb)
        if self.num_classes is not None:
            assert y is not None and y.shape == (emb.shape[0],)
            emb = emb + nn.Embed(self.num_classes, time_embed_dim, name="label_emb")(y)
        if extra_emb is not None:
            emb = emb + extra_emb

        # --- encoder (reference model/unet.py:352-389, 475-479) ---
        ch = self.model_channels * self.channel_mult[0]
        h = nn.Conv(ch, _kernel(self.dims, 3), padding="SAME",
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        hs = [h]
        ds = 1
        block_id = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = self._res_block(
                    f"down_res{block_id}",
                    deterministic,
                    channels=ch,
                    emb_channels=time_embed_dim,
                    out_channels=mult * self.model_channels,
                )(h, emb)
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = self._attn_block(ch, self.num_heads, f"down_attn{block_id}")(h)
                hs.append(h)
                block_id += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(
                    ch, self.conv_resample, dims=self.dims, dtype=self.dtype,
                    name=f"down_ds{level}"
                )(h)
                hs.append(h)
                ds *= 2

        # --- middle: Res – Attn – Res (reference model/unet.py:391-411) ---
        h = self._res_block(
            "mid_res0", deterministic, channels=ch, emb_channels=time_embed_dim
        )(h, emb)
        h = self._attn_block(ch, self.num_heads, "mid_attn")(h)
        h = self._res_block(
            "mid_res1",
            deterministic,
            channels=ch,
            emb_channels=time_embed_dim,
            out_channels=1 if self.learn_potential else None,
            no_bias_last_layer=self.learn_potential,
        )(h, emb)

        if potential_only or self.learn_potential:
            # scalar potential: mean of middle features, summed over batch
            # (reference model/unet.py:498-499)
            return h.mean(axis=tuple(range(1, h.ndim))).sum()

        features = dict(down=list(hs), middle=h, up=[]) if return_features else None

        # --- decoder (reference model/unet.py:413-446, 513-517) ---
        shapes = [self.in_space]
        for _ in range(len(self.channel_mult)):
            shapes.append(shapes[-1] // 2)
        block_id = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = self._res_block(
                    f"up_res{block_id}",
                    deterministic,
                    channels=ch + skip.shape[-1],
                    emb_channels=time_embed_dim,
                    out_channels=self.model_channels * mult,
                )(jnp.concatenate([h, skip], axis=-1), emb)
                ch = self.model_channels * mult
                if ds in self.attention_resolutions:
                    h = self._attn_block(ch, num_heads_up, f"up_attn{block_id}")(h)
                if level and i == self.num_res_blocks:
                    h = Upsample(
                        ch,
                        self.conv_resample,
                        dims=self.dims,
                        odd_size=shapes[level] % 2 == 1,
                        dtype=self.dtype,
                        name=f"up_us{level}",
                    )(h)
                    ds //= 2
                if return_features:
                    features["up"].append(h)
                block_id += 1

        out = GroupNorm32(ch, silu=True, name="out_norm")(h)
        out = nn.Conv(
            self.out_channels,
            _kernel(self.dims, 3),
            padding="SAME",
            kernel_init=zero_init(),
            bias_init=zero_init(),
            dtype=jnp.float32 if self.fp32_head else self.dtype,
            name="conv_out",
        )(out).astype(jnp.float32)
        if return_features:
            features["out"] = out
            return features
        return out


def potential_score(model, variables, x, timesteps, y=None, extra_emb=None):
    """Score as the gradient of the learned potential: ∇ₓ Σ_b mean(middle_b)
    (reference: model/unet.py:492-511, done there with create_graph backward;
    here a plain jax.grad, which also composes with the SSM-loss JVP)."""

    def pot(xv):
        return model.apply(
            variables, xv, timesteps, y=y, extra_emb=extra_emb, potential_only=True
        )

    return jax.grad(pot)(x)


class ConditionalModel(nn.Module):
    """Conditional denoising: concatenates a same-resolution conditioning
    image along channels before the core U-Net
    (reference: model/unet.py:555-574)."""

    core: UNetModel

    @nn.compact
    def __call__(self, x, timesteps, conditional=None, **kwargs):
        assert conditional is not None, "ConditionalModel requires `conditional`"
        return self.core(
            jnp.concatenate([x, conditional], axis=-1), timesteps, **kwargs
        )
