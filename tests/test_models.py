"""Score networks: shapes, zero-init heads, premodules, potential mode.

Parity targets: MLP (NN.py:73-120), UNet1D (NNUnet1D.py:27-179),
UNetModel/ConditionalModel (model/unet.py), VorticityUNet (NNUnet.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.models import (
    MLP,
    UNet1D,
    UNetModel,
    ConditionalModel,
    VorticityUNet,
    flat_to_img,
    img_to_flat,
    timestep_embedding,
)
from sdeflow_tpu.models.unet2d import potential_score


def test_timestep_embedding_structure():
    emb = timestep_embedding(jnp.asarray([0.0, 1.0]), 8)
    assert emb.shape == (2, 8)
    # t=0: cos part = 1, sin part = 0 ([cos | sin] ordering like the reference)
    assert np.allclose(np.asarray(emb[0, :4]), 1.0)
    assert np.allclose(np.asarray(emb[0, 4:]), 0.0)
    # odd dim zero-pads the last column
    emb_odd = timestep_embedding(jnp.asarray([0.3]), 7)
    assert emb_odd.shape == (1, 7)
    assert float(emb_odd[0, -1]) == 0.0


@pytest.mark.parametrize("premodule", [None, "NormalizeLogRadius"])
def test_mlp_shapes_and_premodule(rng, premodule):
    d = 6
    model = MLP(input_dim=d, premodule=premodule)
    x = jax.random.normal(rng, (8, d))
    t = jax.random.uniform(jax.random.fold_in(rng, 1), (8,))
    variables = model.init(jax.random.fold_in(rng, 2), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (8, d)
    if premodule == "NormalizeLogRadius":
        # the net sees only direction + log-radius: scaling the input must
        # change the output only through log||x||, not blow it up
        out2 = model.apply(variables, 1000.0 * x, t)
        assert bool(jnp.isfinite(out2).all())


def test_unet1d_shapes(rng):
    for d in (64, 100):
        model = UNet1D(input_dim=d, base_channels=8, channel_mults=(1, 2),
                       premodule="NormalizeLogRadius", emb_dim=16)
        x = jax.random.normal(rng, (4, d))
        t = jax.random.uniform(jax.random.fold_in(rng, 1), (4,))
        variables = model.init(jax.random.fold_in(rng, 2), x, t)
        out = model.apply(variables, x, t)
        assert out.shape == (4, d)
        assert bool(jnp.isfinite(out).all())


def _tiny_unet(**kw):
    cfg = dict(
        in_channels=1,
        model_channels=8,
        out_channels=1,
        in_space=16,
        num_res_blocks=1,
        attention_resolutions=(2, 4),
        channel_mult=(1, 2, 4),
    )
    cfg.update(kw)
    return UNetModel(**cfg)


def test_unet2d_zero_init_output(rng):
    """Fresh output must be exactly 0 (zero-initialized final conv, matching
    the reference's zero_module head, model/unet.py:442-446)."""
    model = _tiny_unet()
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.asarray([0.1, 0.9])
    variables = model.init(jax.random.fold_in(rng, 1), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, 16, 16, 1)
    assert float(jnp.abs(out).max()) == 0.0


def test_unet2d_class_conditional(rng):
    model = _tiny_unet(num_classes=5)
    x = jax.random.normal(rng, (3, 16, 16, 1))
    t = jnp.asarray([0.1, 0.5, 0.9])
    y = jnp.asarray([0, 2, 4])
    variables = model.init(jax.random.fold_in(rng, 1), x, t, y=y)
    out = model.apply(variables, x, t, y=y)
    assert out.shape == (3, 16, 16, 1)


def test_unet2d_checkpointing_matches(rng):
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.asarray([0.3, 0.7])
    m_plain = _tiny_unet(use_checkpoint=False)
    m_remat = _tiny_unet(use_checkpoint=True)
    variables = m_plain.init(jax.random.fold_in(rng, 1), x, t)
    out_plain = m_plain.apply(variables, x, t)
    out_remat = m_remat.apply(variables, x, t)
    assert jnp.allclose(out_plain, out_remat, atol=1e-5)


def test_unet2d_feature_vectors(rng):
    model = _tiny_unet()
    x = jax.random.normal(rng, (1, 16, 16, 1))
    t = jnp.asarray([0.5])
    variables = model.init(jax.random.fold_in(rng, 1), x, t)
    feats = model.apply(variables, x, t, return_features=True)
    assert set(feats) == {"down", "middle", "up", "out"}
    assert feats["middle"].shape[0] == 1
    assert len(feats["down"]) > 0 and len(feats["up"]) > 0


def test_unet2d_learn_potential_score(rng):
    model = _tiny_unet(learn_potential=True)
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.asarray([0.2, 0.8])
    variables = model.init(jax.random.fold_in(rng, 1), x, t)
    pot = model.apply(variables, x, t)
    assert pot.shape == ()  # scalar potential
    score = potential_score(model, variables, x, t)
    assert score.shape == x.shape
    assert bool(jnp.isfinite(score).all())


def test_conditional_model(rng):
    core = _tiny_unet(in_channels=2)
    model = ConditionalModel(core=core)
    x = jax.random.normal(rng, (2, 16, 16, 1))
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 1))
    t = jnp.asarray([0.1, 0.9])
    variables = model.init(jax.random.fold_in(rng, 2), x, t, conditional=cond)
    out = model.apply(variables, x, t, conditional=cond)
    assert out.shape == (2, 16, 16, 1)


def test_flat_img_roundtrip():
    x = jnp.arange(2 * 12.0).reshape(2, 12)
    for order in ("C", "F"):
        img = flat_to_img(x, 3, 4, order=order)
        assert img.shape == (2, 3, 4, 1)
        back = img_to_flat(img, order=order)
        assert jnp.allclose(back, x, atol=1e-5)
    # F-order places consecutive flat entries down columns (reference
    # NNUnet.py:36: view(B,1,W,H).transpose)
    img_f = flat_to_img(x, 3, 4, order="F")
    assert float(img_f[0, 1, 0, 0] * 5.0) == 1.0  # x[0,1] -> row 1, col 0


@pytest.mark.parametrize("premodule", [None, "NormalizeLogRadius"])
def test_vorticity_unet_flat_api(rng, premodule):
    d = 16 * 16
    model = VorticityUNet(
        base_channels=8,
        channel_mults=(1, 2),
        num_res_blocks=1,
        premodule=premodule,
        in_space=16,
        attention_resolutions=(2,),
        flatten_order="F",
    )
    x = jax.random.normal(rng, (2, d))
    t = jnp.asarray([0.1, 0.6])
    variables = model.init(jax.random.fold_in(rng, 1), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, d)


def test_vorticity_unet_learn_potential(rng):
    d = 16 * 16
    model = VorticityUNet(
        base_channels=8,
        channel_mults=(1, 2),
        num_res_blocks=1,
        premodule="NormalizeLogRadius",
        in_space=16,
        attention_resolutions=(2,),
        learn_potential=True,
    )
    x = jax.random.normal(rng, (2, d))
    t = jnp.asarray([0.1, 0.6])
    variables = model.init(jax.random.fold_in(rng, 1), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, d)
    assert bool(jnp.isfinite(out).all())


def test_unet2d_bfloat16_compute(rng):
    """bf16 compute dtype: same params, fp32 output, close to fp32 compute."""
    import jax.numpy as jnp

    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.asarray([0.3, 0.7])
    m32 = _tiny_unet()
    mbf = _tiny_unet(dtype=jnp.bfloat16)
    variables = m32.init(jax.random.fold_in(rng, 1), x, t)
    out32 = m32.apply(variables, x, t)
    outbf = mbf.apply(variables, x, t)
    assert outbf.dtype == jnp.float32  # output cast back
    assert float(jnp.abs(out32 - outbf).max()) < 0.1


def test_unet_dims3(rng):
    """conv_nd's dims=3 surface (reference model/nn_utils.py:49-97): the
    U-Net compiles and runs on volumetric (B, D, H, W, C) inputs, including
    attention over the flattened voxel axis and the odd-size Upsample crop
    on all three axes."""
    import jax.numpy as jnp

    from sdeflow_tpu.models.unet2d import UNetModel

    m = UNetModel(in_channels=1, model_channels=8, out_channels=1,
                  in_space=8, num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), dims=3)
    x = jax.random.normal(rng, (2, 8, 8, 8, 1))
    t = jnp.array([0.1, 0.5])
    v = m.init(rng, x, t)
    y = m.apply(v, x, t)
    assert y.shape == (2, 8, 8, 8, 1)
    assert jnp.isfinite(y).all()

    # odd cube: exercises Upsample(odd_size=True)'s crop on every axis
    m7 = UNetModel(in_channels=1, model_channels=8, out_channels=1,
                   in_space=7, num_res_blocks=1, attention_resolutions=(),
                   channel_mult=(1, 2), dims=3)
    x7 = jax.random.normal(rng, (2, 7, 7, 7, 1))
    y7 = m7.apply(m7.init(rng, x7, t), x7, t)
    assert y7.shape == (2, 7, 7, 7, 1)
