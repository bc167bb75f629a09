"""Sharding: DP train step parity with single-device, TP param placement,
mesh-sharded MMD parity — on the 8-virtual-device CPU mesh (SURVEY.md §4's
TPU-specific oracle: pjit-sharded vs single-device equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdeflow_tpu.data import SwissRoll
from sdeflow_tpu.models import MLP
from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
from sdeflow_tpu.training import TrainState, make_train_step
from sdeflow_tpu.parallel import (
    make_mesh,
    shard_batch,
    replicate,
    make_parallel_train_step,
    shard_mlp_params,
    sharded_mmd,
    parallel_sample,
)
from sdeflow_tpu.eval import compute_mmd


def _mk_state(rng, batch=64):
    sampler = SwissRoll()
    model = MLP(input_dim=2)
    x = sampler.sample(rng, batch)
    variables = model.init(rng, x, jnp.zeros((batch,)))
    sde = SGMSde.create(num_steps_forward=8)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-3)
    state = TrainState(
        gen_sde=gen, opt_state=opt.init(gen.a_params), step=jnp.zeros((), jnp.int32)
    )
    return state, opt, x


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_train_step_matches_single_device(rng):
    """One DP step over 8 devices must equal the single-device step bitwise
    (same key, same batch — the psum-reduced mean grad is the same mean)."""
    state, opt, x = _mk_state(rng)
    key = jax.random.fold_in(rng, 1)

    single = make_train_step(opt)
    s1, loss1 = single(state, key, x)

    mesh = make_mesh()
    par = make_parallel_train_step(opt, mesh)
    s2, loss2 = par(replicate(state, mesh), replicate(key, mesh), shard_batch(x, mesh))

    assert np.allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.gen_sde.a_params),
        jax.tree_util.tree_leaves(s2.gen_sde.a_params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tensor_parallel_mlp_matches(rng):
    """Model-axis sharding of the MLP weights must not change the math."""
    state, opt, x = _mk_state(rng)
    mesh = make_mesh(n_data=4, n_model=2)
    model = MLP(input_dim=2)
    t = jnp.zeros((x.shape[0],))
    dense_out = model.apply(state.gen_sde.a_params, x, t)
    sharded_vars = shard_mlp_params(state.gen_sde.a_params, mesh)
    with jax.set_mesh(mesh):
        sharded_out = model.apply(sharded_vars, x, t)
    assert np.allclose(np.asarray(dense_out), np.asarray(sharded_out), atol=1e-5)


def test_tensor_parallel_unet_matches(rng):
    """Model-axis sharding of the attention U-Net (VorticityUNet) must not
    change the math: column/row-sharded ResBlock convs, emb projections and
    attention qkv/proj against the replicated forward."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.parallel import shard_unet_params

    model = VorticityUNet(
        base_channels=8,
        channel_mults=(1, 2),
        num_res_blocks=1,
        premodule="NormalizeLogRadius",
        in_space=8,
        attention_resolutions=(2,),
    )
    x = jax.random.normal(rng, (4, 64))
    t = jnp.linspace(0.1, 1.0, 4)
    variables = model.init(rng, x, t)
    dense_out = model.apply(variables, x, t)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded_vars = shard_unet_params(variables, mesh)
    with jax.set_mesh(mesh):
        sharded_out = model.apply(sharded_vars, x, t)
    assert np.allclose(np.asarray(dense_out), np.asarray(sharded_out), atol=1e-5)


def test_shard_params_asserts_when_rules_miss(rng):
    """Renamed layers must raise, not silently turn TP into a no-op."""
    from sdeflow_tpu.parallel import shard_params

    state, opt, x = _mk_state(rng)
    mesh = make_mesh(n_data=4, n_model=2)
    with pytest.raises(ValueError, match="matched the TP rules"):
        shard_params(
            state.gen_sde.a_params, mesh,
            ((r"no_such_layer/kernel$", lambda v: None),),
        )


def test_tp_unet_train_step(rng):
    """Full DP+TP SSM train step on the sharded U-Net stays finite and
    matches the replicated step."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.parallel import shard_unet_params
    from sdeflow_tpu.training import make_train_step

    d = 64
    model = VorticityUNet(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        in_space=8, attention_resolutions=(2,),
    )
    x = jax.random.normal(rng, (8, d))
    variables = model.init(rng, x, jnp.zeros((8,)))
    sde = SGMSde.create(num_steps_forward=4)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-3)
    state = TrainState(
        gen_sde=gen, opt_state=opt.init(gen.a_params),
        step=jnp.zeros((), jnp.int32),
    )
    key = jax.random.fold_in(rng, 1)

    single = make_train_step(opt)
    s1, loss1 = single(state, key, x)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded_vars = shard_unet_params(variables, mesh)
    gen_tp = PluginReverseSDE.create(sde, model.apply, sharded_vars)
    state_tp = TrainState(
        gen_sde=gen_tp,
        opt_state=replicate(opt.init(gen_tp.a_params), mesh),
        step=jnp.zeros((), jnp.int32),
    )
    par = make_parallel_train_step(opt, mesh)
    s2, loss2 = par(state_tp, replicate(key, mesh), shard_batch(x, mesh))
    assert np.allclose(float(loss1), float(loss2), rtol=1e-4)


def test_sharded_mmd_matches_tiled(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (1001, 3))  # non-multiple of 8
    y = jax.random.normal(k2, (517, 3)) + 0.3
    mesh = make_mesh()
    a = float(sharded_mmd(x, y, mesh))
    b = float(compute_mmd(x, y))
    assert abs(a - b) < 1e-6


def test_parallel_sample_runs_and_is_finite(rng):
    state, opt, x = _mk_state(rng)
    mesh = make_mesh()
    out = parallel_sample(
        state.gen_sde, jax.random.fold_in(rng, 2), 160, 2, 16, mesh
    )
    assert out.shape == (160, 2)
    assert bool(jnp.isfinite(out).all())
    # actually sharded over the data axis
    assert len(out.sharding.device_set) == 8


def test_parallel_train_chunk_matches_single_device(rng):
    """The DP fused chunk must produce the same params as the single-host
    fused chunk (same keys, same on-device sampling schedule)."""
    from sdeflow_tpu.training.train import make_train_chunk
    from sdeflow_tpu.parallel import make_parallel_train_chunk
    from sdeflow_tpu.data import SwissRoll

    state, opt, x = _mk_state(rng)
    sampler = SwissRoll()
    key = jax.random.fold_in(rng, 5)

    single = make_train_chunk(opt, sampler.sample, 64)
    s1, loss1 = single(state, key, 20)

    mesh = make_mesh()
    par = make_parallel_train_chunk(opt, sampler.sample, 64, mesh)
    s2, loss2 = par(replicate(state, mesh), replicate(key, mesh), 20)

    assert np.allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.gen_sde.a_params),
        jax.tree_util.tree_leaves(s2.gen_sde.a_params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ring_attention_matches_math():
    """Sequence-parallel ring attention (T sharded over "model", KV shards
    rotated via ppermute) is exactly the single-device attention math, and
    its gradient rings too."""
    import jax
    import jax.numpy as jnp

    from sdeflow_tpu.parallel import make_mesh, ring_attention
    from sdeflow_tpu.ops.pallas.attention import _attention_math

    mesh = make_mesh(n_data=1, n_model=8)
    key = jax.random.PRNGKey(7)
    b, t, c, h = 2, 512, 64, 4
    qkv = jax.random.normal(key, (b, t, 3 * c), dtype=jnp.float32)

    out_ring = ring_attention(qkv, h, mesh)
    out_ref = _attention_math(qkv, h)
    assert out_ring.shape == (b, t, c)
    assert jnp.max(jnp.abs(out_ring - out_ref)) < 2e-5

    g = jax.random.normal(jax.random.fold_in(key, 1), out_ref.shape)
    grad_ring = jax.grad(lambda q: jnp.vdot(ring_attention(q, h, mesh), g))(qkv)
    grad_ref = jax.grad(lambda q: jnp.vdot(_attention_math(q, h), g))(qkv)
    assert jnp.max(jnp.abs(grad_ring - grad_ref)) < 5e-5


def test_mesh_trainer_resume_preserves_tp_sharding(tmp_path):
    """Resuming under a mesh re-applies the live placements: restored TP
    params keep their "model"-axis sharding instead of silently collapsing
    to single-device."""
    import os

    import jax
    import jax.numpy as jnp

    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import Trainer
    from sdeflow_tpu.parallel import make_mesh, shard_mlp_params

    rng = jax.random.PRNGKey(3)
    mesh = make_mesh(n_data=4, n_model=2)
    sampler = SwissRoll()
    path = os.path.join(str(tmp_path), "meshroll")

    def mk_gen():
        model = MLP(input_dim=2)
        x = sampler.sample(rng, 16)
        variables = model.init(rng, x, jnp.zeros((16,)))
        variables = shard_mlp_params(variables, mesh)
        sde = SGMSde.create(num_steps_forward=4)
        return PluginReverseSDE.create(sde, model.apply, variables)

    t1 = Trainer(mk_gen(), sampler, batch_size=8, print_every=2,
                 checkpoint_path=path, mesh=mesh)
    t1.run(jax.random.fold_in(rng, 1), 4)

    t2 = Trainer(mk_gen(), sampler, batch_size=8, print_every=2,
                 checkpoint_path=path, mesh=mesh)
    logs = []
    t2.log_fn = logs.append
    state, _ = t2.run(jax.random.fold_in(rng, 1), 6, resume=True)
    assert any("Resuming" in l for l in logs)
    kern = state.gen_sde.a_params["params"]["dense0"]["kernel"]
    spec = kern.sharding.spec
    assert "model" in jax.tree_util.tree_leaves(tuple(spec)), spec


def test_sharding_aware_restore_materializes_on_mesh(tmp_path, rng):
    """load_checkpoint(shardings=...) restores each leaf DIRECTLY on its
    mesh placement via orbax restore_args — a TP-sharded kernel comes back
    with per-device shards holding only the 1/n_model slice (no full-param
    single-device staging), and the key lands replicated on the mesh."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    import optax

    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.checkpoint import save_checkpoint, load_checkpoint
    from sdeflow_tpu.parallel import make_mesh, shard_mlp_params

    mesh = make_mesh(n_data=4, n_model=2)
    model = MLP(input_dim=2)
    x = jnp.zeros((16, 2))
    variables = shard_mlp_params(model.init(rng, x, jnp.zeros((16,))), mesh)
    sde = SGMSde.create(num_steps_forward=4)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    tx = optax.adam(1e-3)
    state = TrainState(
        gen_sde=gen,
        opt_state=tx.init(gen.a_params),
        step=jnp.zeros((), jnp.int32),
    )
    path = os.path.join(str(tmp_path), "shardrestore")
    save_checkpoint(path, state, rng, 7)

    replicated = NamedSharding(mesh, PartitionSpec())
    placements = jax.tree_util.tree_map(
        lambda a: (
            a.sharding
            if isinstance(getattr(a, "sharding", None), NamedSharding)
            else replicated
        ),
        state,
    )
    restored, key2, it = load_checkpoint(path, state, rng, shardings=placements)
    assert it == 7
    kern = restored.gen_sde.a_params["params"]["dense0"]["kernel"]
    orig = state.gen_sde.a_params["params"]["dense0"]["kernel"]
    # placement preserved, values exact
    assert kern.sharding == orig.sharding
    assert "model" in jax.tree_util.tree_leaves(tuple(kern.sharding.spec))
    assert np.allclose(np.asarray(kern), np.asarray(orig))
    # the leaf is genuinely distributed: each device holds only its
    # 1/n_model column slice, not the full kernel (no single-device staging)
    shard_cols = {s.data.shape[-1] for s in kern.addressable_shards}
    assert shard_cols == {kern.shape[-1] // 2}
    assert len(kern.addressable_shards) == len(mesh.devices.flatten())
    # key restored replicated on the same mesh
    assert jax.random.key_data(key2).sharding.device_set == set(
        mesh.devices.flatten()
    )
    assert np.array_equal(
        np.asarray(jax.random.key_data(key2)), np.asarray(jax.random.key_data(rng))
    )


def test_tensor_parallel_unet1d_matches(rng):
    """UNet1D TP rules (ConvBlock1D conv0 column / conv1 row) must leave the
    forward bitwise-compatible with the replicated math — this is the
    architecture the lorenz63/signal presets drive with --tp."""
    from sdeflow_tpu.models import UNet1D
    from sdeflow_tpu.parallel import shard_unet1d_params

    model = UNet1D(input_dim=64, base_channels=8, channel_mults=(1, 2))
    x = jax.random.normal(rng, (4, 64))
    t = jnp.linspace(0.1, 1.0, 4)
    variables = model.init(rng, x, t)
    dense_out = model.apply(variables, x, t)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded_vars = shard_unet1d_params(variables, mesh)
    with jax.set_mesh(mesh):
        sharded_out = model.apply(sharded_vars, x, t)
    assert np.allclose(np.asarray(dense_out), np.asarray(sharded_out), atol=1e-5)


def test_ring_attention_unet_model_parity():
    """A full VorticityUNet built with attention_impl="ring" (sequence
    sharded over the mesh's "model" axis inside every AttentionBlock)
    matches the replicated "auto" model: same init, same forward, same
    grad, and the SSM loss (forward-mode JVP through the ring's ppermutes)
    agrees — the round-2 review's reachability requirement."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE

    mesh = make_mesh(n_data=1, n_model=2)  # 2 devices: keeps the compile
    # small enough for the suite while still exercising a genuine ring
    key = jax.random.PRNGKey(11)
    kw = dict(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
              in_space=8, attention_resolutions=(1, 2), flatten_order="F")
    ring_net = VorticityUNet(attention_impl="ring", mesh=mesh, **kw)
    auto_net = VorticityUNet(**kw)

    x = jax.random.normal(key, (4, 64))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (4,))
    v_ring = ring_net.init(key, x, t)
    v_auto = auto_net.init(key, x, t)
    # identical parameter trees (the impl switch adds no params)
    for a, b in zip(jax.tree_util.tree_leaves(v_ring),
                    jax.tree_util.tree_leaves(v_auto)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_ring = ring_net.apply(v_ring, x, t)
    y_auto = auto_net.apply(v_auto, x, t)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_auto),
                               atol=2e-5)

    g = jax.random.normal(jax.random.fold_in(key, 2), y_auto.shape)
    gr = jax.grad(lambda v: jnp.vdot(ring_net.apply(v, x, t), g))(v_ring)
    ga = jax.grad(lambda v: jnp.vdot(auto_net.apply(v, x, t), g))(v_auto)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(ga)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # the training objective itself (Hutchinson fwd-JVP) through the ring
    sde = SGMSde.create(num_steps_forward=8)
    gen_ring = PluginReverseSDE.create(sde, ring_net.apply, v_ring)
    gen_auto = PluginReverseSDE.create(sde, auto_net.apply, v_auto)
    k_loss = jax.random.fold_in(key, 3)
    l_ring = gen_ring.ssm(k_loss, x)
    l_auto = gen_auto.ssm(k_loss, x)
    np.testing.assert_allclose(np.asarray(l_ring), np.asarray(l_auto),
                               rtol=1e-4, atol=1e-4)


def test_driver_ring_attention_sweep(tmp_path, monkeypatch):
    """run.py-reachable config: a dbg image sweep with attention_impl="ring"
    on a (data=2, model=4) mesh trains and samples through parallel/ring.py
    (the `--tp 4 --attention-impl ring` path)."""
    from dataclasses import replace

    from sdeflow_tpu.configs import get_preset
    from sdeflow_tpu.experiments.driver import ExperimentDriver

    monkeypatch.chdir(tmp_path)
    cfg = get_preset("grf16_dbg")
    cfg = replace(
        cfg,
        # shrink the U-Net itself (base 8, two levels) so the sweep's jitted
        # programs compile in seconds — attention still fires at ds=2
        # (T=64, ring over the 2-way "model" axis)
        train=replace(cfg.train, attention_impl="ring", num_steps_forward=4,
                      steps_per_dispatch=1, base_channels=8,
                      channel_mults=(1, 2), num_res_blocks=1),
        sweep=replace(cfg.sweep, eval_mmd=True, num_samples=8,
                      iterationss=(2,), num_stepss_backward=(2,),
                      batch_sizes=(4,), ntrain_maxs=(np.inf,)),
        results_dir=str(tmp_path / "results"),
    )
    mesh = make_mesh(n_data=2, n_model=2)
    driver = ExperimentDriver(cfg, log_fn=lambda *_: None, make_plots=False,
                              mesh=mesh)
    results = driver.run(jax.random.PRNGKey(0))
    assert np.isfinite(results["mmd_sgm"][0, 0, 0, 0, 0])
    assert np.isfinite(results["mmd_msgm"][0, 0, 0, 0, 0])
