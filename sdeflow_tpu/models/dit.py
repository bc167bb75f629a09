"""DiT-style transformer score network (no reference counterpart).

The reference's large-d score nets are conv U-Nets (NNUnet1D.py:27-179,
model/unet.py:101-273) whose small-channel convs cap TPU MFU well below
the MXU roofline (README "U-Net roofline": the 16×16/c32 architecture
tops out near ~35%). A DiT (Peebles & Xie 2023) is the MXU-native
alternative: every FLOP is a large dense matmul (qkv/proj/MLP at width
W ≥ 256), so the same SSM/DSM training losses drive a score net that
runs much closer to the hardware ceiling. This is an *addition* to the
model zoo — the flat ``net(x: (B, d), t: (B,)) -> (B, d)`` score
contract, the premodule convention, and the training/sampling stack are
all unchanged.

Architecture (standard DiT, adapted to flat 1D signals):
  * patchify: (B, d) → (B, T=d/patch, patch) → Dense → (B, T, W),
    learned positional embedding;
  * N pre-LN transformer blocks with **adaLN-Zero** conditioning: the
    time embedding produces per-block (shift, scale, gate) for both the
    attention and MLP sublayers, with the modulation projection
    zero-initialized so every block starts as the identity;
  * zero-initialized linear head → unpatchify → (B, d): the score is
    exactly 0 at init (the same zero_module discipline as the
    reference's out-convs, model/unet.py:190).

TPU notes: LayerNorm statistics and attention softmax run in fp32
(GroupNorm32 precedent, models/common.py); everything else follows the
``dtype`` knob for bf16 serving. Tensor parallelism pairs qkv/mlp_in
(column) with proj_out/mlp_out (row) — parallel/sharding.py
DIT_TP_RULES. The premodule="NormalizeLogRadius" option (MSGM) feeds
the signal's log-norm into the conditioning vector instead of a channel
concat, which is the transformer-native equivalent of the reference's
premodule (NN.py:56-70).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdeflow_tpu.models.common import (
    TimeMLP,
    normalize_log_radius,
    timestep_embedding,
    zero_init,
)


def _ln(h):
    """Affine-free LayerNorm with fp32 statistics (adaLN supplies the
    affine map)."""
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.var(h32, axis=-1, keepdims=True)
    return ((h32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(h.dtype)


class DiTBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, c):
        """h: (B, T, W) tokens; c: (B, W) conditioning."""
        mod = nn.Dense(
            6 * self.width, kernel_init=zero_init(), bias_init=zero_init(),
            dtype=self.dtype, name="ada_mod",
        )(nn.silu(c))[:, None, :]  # (B, 1, 6W)
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        # attention sublayer
        x = _ln(h) * (1.0 + sc1) + sh1
        b, t, w = x.shape
        hd = w // self.heads
        qkv = nn.Dense(3 * w, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        att = jnp.einsum("bqhc,bkhc->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)
        ).astype(x.dtype)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhc->bqhc", att, v).reshape(b, t, w)
        o = nn.Dense(w, dtype=self.dtype, name="proj_out")(o)
        h = h + g1 * o

        # MLP sublayer
        x = _ln(h) * (1.0 + sc2) + sh2
        x = nn.Dense(self.mlp_ratio * w, dtype=self.dtype, name="mlp_in")(x)
        x = nn.gelu(x)
        x = nn.Dense(w, dtype=self.dtype, name="mlp_out")(x)
        return h + g2 * x


class DiT1D(nn.Module):
    """Transformer score net over flat (B, d) signals."""

    # Default shape measured on TPU v5e (tools/measure_perf.py sec_dit):
    # width 512 / 4 heads gives head_dim 128 = the MXU lane width, and
    # patch 16 keeps the token count low enough that the attention
    # einsums don't dilute the wide MLP matmuls — 52% bf16 MFU at
    # B=1024/d=1000 vs 25% for width 256 / 8 heads / patch 8 (and vs the
    # conv UNet1D's 38.6% on the same workload).
    input_dim: int
    patch: int = 16
    width: int = 512
    depth: int = 6
    heads: int = 4
    mlp_ratio: int = 4
    premodule: Optional[str] = None  # None | "NormalizeLogRadius"
    dtype: jnp.dtype = jnp.float32
    # fp32 final adaLN modulation + head projection under a bf16
    # compute dtype (the score grows like 1/std(t) near t_epsilon —
    # see models/mlp.py); no-op for fp32
    fp32_head: bool = True

    @nn.compact
    def __call__(self, x, t):
        assert self.premodule in (None, "NormalizeLogRadius")
        sz = x.shape
        x = x.reshape(-1, self.input_dim)
        t = jnp.reshape(t, (-1,)).astype(jnp.float32)

        # conditioning vector (sinusoidal t-embedding → MLP)
        c = TimeMLP(self.width, act="silu", name="time_mlp")(
            timestep_embedding(t, self.width)
        )
        if self.premodule == "NormalizeLogRadius":
            flat, log_norm = normalize_log_radius(x)
            x = flat * jnp.sqrt(jnp.asarray(x.shape[1], x.dtype))
            c = c + TimeMLP(self.width, act="silu", name="norm_embed")(
                log_norm.reshape(-1, 1)
            )

        # patchify (zero-pad d up to a multiple of patch, crop on the way out)
        pad = (-self.input_dim) % self.patch
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        n_tok = (self.input_dim + pad) // self.patch
        h = x.reshape(-1, n_tok, self.patch).astype(self.dtype)
        h = nn.Dense(self.width, dtype=self.dtype, name="patch_embed")(h)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (n_tok, self.width),
            jnp.float32,
        )
        h = h + pos.astype(self.dtype)[None]
        c = c.astype(self.dtype)

        for i in range(self.depth):
            h = DiTBlock(
                width=self.width, heads=self.heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, name=f"block{i}",
            )(h, c)

        # adaLN final layer + zero-init head: score ≡ 0 at init
        head_dtype = jnp.float32 if self.fp32_head else self.dtype
        mod = nn.Dense(
            2 * self.width, kernel_init=zero_init(), bias_init=zero_init(),
            dtype=head_dtype, name="ada_out",
        )(nn.silu(c))[:, None, :]
        sh, sc = jnp.split(mod, 2, axis=-1)
        h = _ln(h) * (1.0 + sc) + sh
        h = nn.Dense(
            self.patch, kernel_init=zero_init(), bias_init=zero_init(),
            dtype=head_dtype, name="head_out",
        )(h)
        out = h.reshape(-1, n_tok * self.patch)[:, : self.input_dim]
        return out.astype(jnp.float32).reshape(sz)


class DiT2D(nn.Module):
    """Transformer score net over flat square images: the MXU-native
    alternative to VorticityUNet on the image configs.

    Same outer contract as VorticityUNet (models/vorticity.py — the
    reference's NNUnet.py:145-246 rewritten): accepts flat (B, d=H·W)
    (C- or F-order) or (B, H, W, 1), applies the /5 value rescale, and
    with premodule="NormalizeLogRadius" projects to the sphere and adds
    a log‖x‖ embedding to the conditioning vector. Inside, instead of
    small-channel convs (which cap the 16×16/c32 U-Net near ~35% MFU —
    README "U-Net roofline"), the image is cut into p×p patches and run
    through the same adaLN-Zero DiTBlock stack as DiT1D, so every FLOP
    is a width-W dense matmul. Zero-init head → score ≡ 0 at init."""

    in_space: int = 16
    patch: int = 4
    width: int = 512
    depth: int = 6
    heads: int = 4
    mlp_ratio: int = 4
    premodule: Optional[str] = None  # None | "NormalizeLogRadius"
    flatten_order: str = "C"
    dtype: jnp.dtype = jnp.float32
    # fp32 final adaLN modulation + head projection under a bf16
    # compute dtype (the score grows like 1/std(t) near t_epsilon —
    # see models/mlp.py); no-op for fp32
    fp32_head: bool = True

    @nn.compact
    def __call__(self, x, t, deterministic=True):
        from sdeflow_tpu.models.vorticity import flat_to_img, img_to_flat

        assert self.premodule in (None, "NormalizeLogRadius")
        assert self.flatten_order in ("C", "F")
        H = W = self.in_space
        p = self.patch
        assert H % p == 0, f"patch {p} must divide in_space {H}"
        t = jnp.reshape(t, (-1,)).astype(jnp.float32)

        c = TimeMLP(self.width, act="silu", name="time_mlp")(
            timestep_embedding(t, self.width)
        )
        if self.premodule == "NormalizeLogRadius":
            flat = x if x.ndim == 2 else x.reshape(x.shape[0], -1)
            flat, log_norm = normalize_log_radius(flat)
            # same √d rescale as VorticityUNet (reference NNUnet.py:205)
            flat = flat * jnp.sqrt(jnp.asarray(flat.shape[-1], flat.dtype))
            x = flat if x.ndim == 2 else flat.reshape(x.shape)
            c = c + TimeMLP(self.width, act="silu", name="norm_embed")(
                log_norm.reshape(-1, 1)
            )

        need_flat = x.ndim == 2
        if need_flat:
            x_img = flat_to_img(x, H, W, order=self.flatten_order)
        else:
            assert x.ndim == 4 and x.shape[-1] == 1, (
                f"Expected (B,H,W,1), got {x.shape}"
            )
            x_img = x / 5.0  # SCALE_IMAGE, models/vorticity.py:21

        # p×p patchify: (B,H,W,1) -> (B, T=(H/p)·(W/p), p²)
        b = x_img.shape[0]
        hp, wp = H // p, W // p
        h = x_img[..., 0].reshape(b, hp, p, wp, p)
        h = jnp.transpose(h, (0, 1, 3, 2, 4)).reshape(b, hp * wp, p * p)
        h = h.astype(self.dtype)
        h = nn.Dense(self.width, dtype=self.dtype, name="patch_embed")(h)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (hp * wp, self.width),
            jnp.float32,
        )
        h = h + pos.astype(self.dtype)[None]
        c = c.astype(self.dtype)

        for i in range(self.depth):
            h = DiTBlock(
                width=self.width, heads=self.heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, name=f"block{i}",
            )(h, c)

        head_dtype = jnp.float32 if self.fp32_head else self.dtype
        mod = nn.Dense(
            2 * self.width, kernel_init=zero_init(), bias_init=zero_init(),
            dtype=head_dtype, name="ada_out",
        )(nn.silu(c))[:, None, :]
        sh, sc = jnp.split(mod, 2, axis=-1)
        h = _ln(h) * (1.0 + sc) + sh
        h = nn.Dense(
            p * p, kernel_init=zero_init(), bias_init=zero_init(),
            dtype=head_dtype, name="head_out",
        )(h)
        # unpatchify back to (B, H, W, 1)
        y = h.reshape(b, hp, wp, p, p)
        y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, H, W, 1)
        y = y.astype(jnp.float32)
        if need_flat:
            return img_to_flat(y, order=self.flatten_order)
        return y * 5.0
