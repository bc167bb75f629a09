"""DiT transformer score network (models/dit.py — no reference
counterpart; the MXU-native alternative to the conv U-Nets)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdeflow_tpu.models import DiT1D
from sdeflow_tpu.sde import SGMSde, PluginReverseSDE


def _mk(d=16, patch=4, **kw):
    kw.setdefault("width", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("heads", 4)
    return DiT1D(input_dim=d, patch=patch, **kw)


def test_shapes_and_zero_at_init(rng):
    """adaLN-Zero + zero-init head: the score is exactly 0 at init (the
    same discipline as the reference's zero_module out-convs)."""
    model = _mk()
    x = jax.random.normal(rng, (8, 16))
    t = jnp.linspace(0.1, 1.0, 8)
    variables = model.init(rng, x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (8, 16) and out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_nonzero_after_perturbation(rng):
    """With non-zero head weights the net is a real function of (x, t)."""
    model = _mk()
    x = jax.random.normal(rng, (4, 16))
    t = jnp.full((4,), 0.5)
    variables = model.init(rng, x, t)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    out = model.apply(variables, x, t)
    assert bool(jnp.any(out != 0.0))
    out2 = model.apply(variables, x, jnp.full((4,), 0.9))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_pad_and_crop_odd_dim(rng):
    """d not divisible by patch: zero-pad in, crop out."""
    model = _mk(d=13, patch=8)
    x = jax.random.normal(rng, (4, 13))
    variables = model.init(rng, x, jnp.zeros((4,)))
    out = model.apply(variables, x, jnp.zeros((4,)))
    assert out.shape == (4, 13)


def test_premodule_norm_conditioning(rng):
    """premodule="NormalizeLogRadius": output responds to the input's
    radius through the conditioning vector (MSGM convention)."""
    model = _mk(premodule="NormalizeLogRadius")
    x = jax.random.normal(rng, (4, 16))
    variables = model.init(rng, x, jnp.zeros((4,)))
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    out1 = model.apply(variables, x, jnp.full((4,), 0.5))
    out2 = model.apply(variables, 10.0 * x, jnp.full((4,), 0.5))
    # same direction, different radius -> different score (not just scaled)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_ssm_training_decreases_loss(rng):
    """End to end: the DiT trains under the SSM loss like every other
    score net (same flat contract, same PluginReverseSDE stack)."""
    from sdeflow_tpu.training import TrainState, make_train_step

    d = 16
    model = _mk(d=d)
    mean = jnp.concatenate([jnp.ones(d // 2), -jnp.ones(d // 2)])

    def draw(k, n):
        return mean[None] + 0.3 * jax.random.normal(k, (n, d))

    x = draw(rng, 64)
    variables = model.init(rng, x, jnp.zeros((64,)))
    sde = SGMSde.create(num_steps_forward=8)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-3)
    state = TrainState(
        gen_sde=gen, opt_state=opt.init(gen.a_params),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(opt)
    losses = []
    for i in range(120):
        k = jax.random.fold_in(rng, i)
        state, loss = step(state, k, draw(jax.random.fold_in(k, 1), 64))
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20]), (
        losses[:5], losses[-5:]
    )


def test_tensor_parallel_dit_matches(rng):
    """DIT_TP_RULES (qkv/mlp_in column, proj_out/mlp_out row) must leave
    the forward bitwise-compatible with the replicated math."""
    from sdeflow_tpu.parallel import make_mesh, shard_dit_params

    model = _mk()
    x = jax.random.normal(rng, (4, 16))
    t = jnp.linspace(0.1, 1.0, 4)
    variables = model.init(rng, x, t)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    dense_out = model.apply(variables, x, t)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded_vars = shard_dit_params(variables, mesh)
    with jax.set_mesh(mesh):
        sharded_out = model.apply(sharded_vars, x, t)
    assert np.allclose(np.asarray(dense_out), np.asarray(sharded_out),
                       atol=1e-5)


def test_driver_factory_builds_dit():
    from dataclasses import replace

    from sdeflow_tpu.configs import get_preset
    from sdeflow_tpu.experiments.driver import make_model

    cfg = get_preset("swissroll_dbg")
    cfg = replace(cfg, train=replace(cfg.train, nn_archi="DiT", dit_patch=1,
                                     dit_width=32, dit_depth=1, dit_heads=2))
    model = make_model(cfg, 2, None)
    assert isinstance(model, DiT1D)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 2))
    variables = model.init(key, x, jnp.zeros((4,)))
    assert model.apply(variables, x, jnp.zeros((4,))).shape == (4, 2)


def test_bf16_dtype_knob(rng):
    model = _mk(dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (4, 16))
    variables = model.init(rng, x, jnp.zeros((4,)))
    out = model.apply(variables, x, jnp.zeros((4,)))
    assert out.dtype == jnp.float32  # fp32 contract at the boundary


def test_heads_must_divide_width():
    with pytest.raises(Exception):
        m = _mk(width=65, heads=4)
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)), jnp.zeros((2,)))


# ---------- DiT2D (image-config transformer, models/dit.py) ----------

from sdeflow_tpu.models import DiT2D  # noqa: E402


def _mk2d(in_space=8, patch=2, **kw):
    kw.setdefault("width", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("heads", 4)
    return DiT2D(in_space=in_space, patch=patch, **kw)


def test_dit2d_shapes_and_zero_at_init(rng):
    """Flat (B, d) in/out like VorticityUNet; score exactly 0 at init."""
    model = _mk2d()
    x = jax.random.normal(rng, (4, 64))
    t = jnp.linspace(0.1, 1.0, 4)
    variables = model.init(rng, x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (4, 64) and out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_dit2d_flat_matches_image_input(rng):
    """The flat (B, d) C-order path and the (B, H, W, 1) image path are the
    same function (the flat↔image reshapes are inverses, including the /5
    rescale — models/vorticity.py flat_to_img/img_to_flat)."""
    from sdeflow_tpu.models import flat_to_img, img_to_flat

    model = _mk2d(flatten_order="C")
    x = jax.random.normal(rng, (4, 64))
    t = jnp.full((4,), 0.5)
    variables = model.init(rng, x, t)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    out_flat = model.apply(variables, x, t)
    x_img = flat_to_img(x, 8, 8) * 5.0  # undo the helper's /5: raw image
    out_img = model.apply(variables, x_img, t)
    np.testing.assert_allclose(
        np.asarray(out_flat), np.asarray(img_to_flat(out_img / 5.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_dit2d_f_order_consistency(rng):
    """flatten_order="F" (the image configs' column-major convention,
    NNUnet.py view+transpose): feeding the F-flattened image equals
    C-flattening its transpose."""
    model_f = _mk2d(flatten_order="F")
    x = jax.random.normal(rng, (4, 64))
    t = jnp.full((4,), 0.5)
    variables = model_f.init(rng, x, t)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    out_f = model_f.apply(variables, x, t)
    # same params, C-order module, transposed image == identical program
    model_c = _mk2d(flatten_order="C")
    x_img_f = jnp.transpose(x.reshape(4, 8, 8), (0, 2, 1)).reshape(4, 64)
    out_c = model_c.apply(variables, x_img_f, t)
    np.testing.assert_allclose(
        np.asarray(out_f.reshape(4, 8, 8)),
        np.asarray(jnp.transpose(out_c.reshape(4, 8, 8), (0, 2, 1))),
        rtol=1e-5, atol=1e-6,
    )


def test_dit2d_premodule_norm_conditioning(rng):
    model = _mk2d(premodule="NormalizeLogRadius")
    x = jax.random.normal(rng, (4, 64))
    variables = model.init(rng, x, jnp.zeros((4,)))
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    out1 = model.apply(variables, x, jnp.full((4,), 0.5))
    out2 = model.apply(variables, 10.0 * x, jnp.full((4,), 0.5))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_dit2d_tensor_parallel_matches(rng):
    """DIT_TP_RULES apply unchanged (same DiTBlock param paths)."""
    from sdeflow_tpu.parallel import make_mesh, shard_dit_params

    model = _mk2d()
    x = jax.random.normal(rng, (4, 64))
    t = jnp.linspace(0.1, 1.0, 4)
    variables = model.init(rng, x, t)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.ones_like(v), variables
    )
    dense_out = model.apply(variables, x, t)
    mesh = make_mesh(n_data=4, n_model=2)
    sharded_vars = shard_dit_params(variables, mesh)
    with jax.set_mesh(mesh):
        sharded_out = model.apply(sharded_vars, x, t)
    assert np.allclose(np.asarray(dense_out), np.asarray(sharded_out),
                       atol=1e-5)


def test_dit2d_ssm_training_decreases_loss(rng):
    """End to end on a toy image distribution through the standard stack."""
    from sdeflow_tpu.training import TrainState, make_train_step

    d = 64
    model = _mk2d()
    mean = jnp.sin(jnp.linspace(0, 3 * jnp.pi, d))

    def draw(k, n):
        return mean[None] + 0.3 * jax.random.normal(k, (n, d))

    x = draw(rng, 32)
    variables = model.init(rng, x, jnp.zeros((32,)))
    sde = SGMSde.create(num_steps_forward=8)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-3)
    state = TrainState(
        gen_sde=gen, opt_state=opt.init(gen.a_params),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(opt)
    losses = []
    for i in range(80):
        k = jax.random.fold_in(rng, i)
        state, loss = step(state, k, draw(jax.random.fold_in(k, 1), 32))
        losses.append(float(loss))
    assert np.mean(losses[-15:]) < np.mean(losses[:15]), (
        losses[:5], losses[-5:]
    )


def test_driver_factory_builds_dit2d():
    from dataclasses import replace

    from sdeflow_tpu.configs import get_preset
    from sdeflow_tpu.experiments.driver import make_model

    cfg = get_preset("grf16_dit")
    assert cfg.train.nn_archi == "DiT2D" and cfg.train.dit_patch == 4
    cfg = replace(cfg, train=replace(cfg.train, dit_width=32, dit_depth=1,
                                     dit_heads=2))
    model = make_model(cfg, 256, "NormalizeLogRadius")
    assert isinstance(model, DiT2D)
    assert model.flatten_order == "F" and model.in_space == 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 256))
    variables = model.init(key, x, jnp.zeros((2,)))
    assert model.apply(variables, x, jnp.zeros((2,))).shape == (2, 256)
