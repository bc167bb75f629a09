"""Sharded training, sampling and metrics over a device mesh.

TPU-native parallelism layer (absent in the reference — SURVEY.md §2
#19-20, §5 "Distributed communication backend"):

- `make_parallel_train_step`: the jitted SSM/DSM Adam step with the batch
  sharded over the mesh's "data" axis; the gradient all-reduce is the psum
  XLA inserts for the replicated-params/sharded-batch GSPMD partition.
- `shard_mlp_params`: tensor-parallel placement of the MLP's hidden layers
  over the "model" axis (column/row sharding of the (in, hidden) /
  (hidden, hidden) matmuls).
- `sharded_kernel_mean` / `sharded_mmd`: the O(N²) MMD kernel computed in
  row tiles under `shard_map`, each device reducing its tile sums with a
  psum — never materializing the (N, N) matrix on any chip.
- `parallel_sample`: batch-sharded reverse-SDE generation (the whole scan
  partitions trivially along the batch).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sdeflow_tpu.training.train import TrainState


def make_parallel_train_step(optimizer, mesh: Mesh, loss="ssm"):
    """Data-parallel train step: state replicated, batch sharded on "data".

    Same math as training.make_train_step; the only difference is the
    sharding contract, which makes XLA emit a psum over "data" for the
    parameter gradients.
    """

    def loss_fn(params, gen_sde, key, x):
        gen = gen_sde.replace(a_params=params)
        per_sample = gen.ssm(key, x) if loss == "ssm" else gen.dsm(key, x)
        return per_sample.mean()

    batch_sharded = NamedSharding(mesh, P("data"))

    @jax.jit
    def train_step(state: TrainState, key, x):
        # honor the inputs' committed shardings (params may be tensor-sharded
        # over "model"); only the batch is constrained to the data axis
        x = jax.lax.with_sharding_constraint(x, batch_sharded)
        value, grads = jax.value_and_grad(loss_fn)(
            state.gen_sde.a_params, state.gen_sde, key, x
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.gen_sde.a_params
        )
        params = optax.apply_updates(state.gen_sde.a_params, updates)
        return (
            TrainState(
                gen_sde=state.gen_sde.replace(a_params=params),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            value,
        )

    return train_step


def make_parallel_train_chunk(optimizer, sample_fn, batch_size, mesh: Mesh,
                              loss="ssm"):
    """Fused multi-step trainer x data parallelism: training.make_train_chunk
    with the per-step on-device batch constrained to the mesh's "data" axis
    (XLA inserts the grad psum). One scan body definition — the trainer
    logic lives only in training/train.py."""
    from sdeflow_tpu.training.train import make_train_chunk

    batch_sharded = NamedSharding(mesh, P("data"))

    def sharded_sample(key, n):
        return jax.lax.with_sharding_constraint(
            sample_fn(key, n), batch_sharded
        )

    return make_train_chunk(optimizer, sharded_sample, batch_size, loss=loss)


def shard_mlp_params(variables, mesh: Mesh):
    """Tensor-parallel placement for the MLP score net in the Megatron
    column→row pairing: dense0/dense2 kernels column-sharded P(None,"model")
    (activations come out hidden-sharded, biases sharded to match), and
    dense1/dense_out kernels row-sharded P("model",None) (local contraction
    over the sharded hidden axis, then one psum; biases replicated). Each
    hidden matmul then contracts locally with a single reduce instead of
    all-gathering activations between layers."""

    COLUMN = ("dense0", "dense2")  # outputs sharded over "model"
    ROW = ("dense1", "dense_out")  # contract the sharded axis, psum after

    def place(path, x):
        name = "/".join(str(p) for p in path)
        spec = P()
        if any(k in name for k in COLUMN):
            spec = P(None, "model") if x.ndim == 2 else P("model")
        elif any(k in name for k in ROW):
            spec = P("model", None) if x.ndim == 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)


def sharded_kernel_mean(x, y, mesh: Mesh):
    """Mean Gaussian kernel over all pairs, rows of x sharded over "data".

    Each device computes its (N/D, M) kernel tile from the matmul expansion
    and contributes a psum-reduced partial sum over ICI.
    """
    n, dim = x.shape
    n_dev = mesh.shape["data"]
    pad = (-n) % n_dev
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((n,), x.dtype), (0, pad))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None), P("data")),
        out_specs=P(),
    )
    def tile_sum(xb, yb, vb):
        x2 = jnp.sum(xb**2, axis=1)[:, None]
        y2 = jnp.sum(yb**2, axis=1)[None, :]
        sq = jnp.maximum(x2 + y2 - 2.0 * (xb @ yb.T), 0.0)
        k = jnp.exp(-sq / (dim * dim))
        local = jnp.sum(k * vb[:, None])
        return jax.lax.psum(local, "data")

    return tile_sum(xp, y, valid) / (n * y.shape[0])


def sharded_mmd(x, y, mesh: Mesh):
    """MMD² with all three kernel means computed in mesh-sharded tiles
    (kernel parity with eval.mmd / reference quantitative_comparison.py)."""
    kxx = sharded_kernel_mean(x, x, mesh)
    kyy = sharded_kernel_mean(y, y, mesh)
    kxy = sharded_kernel_mean(x, y, mesh)
    return kxx + kyy - 2.0 * kxy


def parallel_sample(
    gen_sde, key, num_samples, dim, num_steps, mesh: Mesh, *, method="rk4",
    lmbd=0.0, norm_correction=False,
):
    """Batch-sharded reverse-SDE generation: latent sample + full solve with
    the batch partitioned over "data". Returns the final (B, d) samples."""
    from sdeflow_tpu.ops.integrators import integrate_sde

    batch_sharded = NamedSharding(mesh, P("data"))

    @partial(jax.jit, out_shardings=batch_sharded)
    def run(gen, k):
        k_lat, k_solve = jax.random.split(k)
        x0 = gen.latent_sample(k_lat, num_samples, dim)
        x0 = jax.lax.with_sharding_constraint(x0, batch_sharded)
        return integrate_sde(
            gen, x0, k_solve, num_steps, method=method, lmbd=lmbd,
            norm_correction=norm_correction,
        )

    return run(gen_sde, key)
