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
