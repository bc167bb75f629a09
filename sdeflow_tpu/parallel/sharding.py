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


def make_parallel_train_step(optimizer, mesh: Mesh, loss="ssm",
                             ema_rate=None, ema_warmup=True):
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
        from sdeflow_tpu.training.train import update_ema, ema_rate_at

        ema = (
            update_ema(state.ema_params, params,
                       ema_rate_at(ema_rate, state.step + 1, ema_warmup))
            if ema_rate is not None
            else state.ema_params
        )
        return (
            TrainState(
                gen_sde=state.gen_sde.replace(a_params=params),
                opt_state=opt_state,
                step=state.step + 1,
                ema_params=ema,
            ),
            value,
        )

    return train_step


def make_parallel_train_chunk(optimizer, sample_fn, batch_size, mesh: Mesh,
                              loss="ssm", ema_rate=None, ema_warmup=True):
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

    return make_train_chunk(optimizer, sharded_sample, batch_size, loss=loss,
                            ema_rate=ema_rate, ema_warmup=ema_warmup)


def _col_spec(x):
    """Column parallel: output (last) axis sharded over "model". Works for
    Dense (in, out) kernels, conv (*k, in, out) kernels, and (out,) biases."""
    return P(*([None] * (x.ndim - 1)), "model")


def _row_spec(x):
    """Row parallel: contraction (second-to-last) axis sharded over "model";
    XLA inserts the psum after the local contraction. Biases replicated."""
    if x.ndim < 2:
        return P()
    return P(*([None] * (x.ndim - 2)), "model", None)


# Megatron column→row pairing for the MLP score net: dense0/dense2 outputs
# sharded (activations come out hidden-sharded, biases sharded to match),
# dense1/dense_out contract the sharded hidden axis locally then psum.
MLP_TP_RULES = (
    (r"(dense0|dense2)/kernel$", _col_spec),
    (r"(dense0|dense2)/bias$", _col_spec),
    (r"(dense1|dense_out)/kernel$", _row_spec),
)

# Tensor-parallel rules for the ADM U-Nets (UNetModel / VorticityUNet /
# UNet1D): each ResBlock's in_conv and the embedding projection are
# column-sharded over the output channels, the zero-init out_conv is
# row-sharded (contracts the sharded channels, one psum back to replicated
# residual stream); attention qkv/proj_out get the same column→row pairing.
# conv_in/conv_out/skip/time-embed stay replicated (thin I/O layers).
UNET_TP_RULES = (
    (r"(in_conv|emb_dense|qkv)/kernel$", _col_spec),
    (r"(in_conv|emb_dense|qkv)/bias$", _col_spec),
    (r"(out_conv|proj_out)/kernel$", _row_spec),
)

# UNet1D (models/unet1d.py): each ConvBlock1D is conv0 -> GELU -> conv1;
# Megatron pairing within the block — conv0 column-sharded over its output
# channels (bias sharded to match, GELU is elementwise on the sharded
# activations), conv1 row-sharded (contracts the sharded channels, psum
# back to the replicated stream). down/up/final/time_mlp stay replicated.
UNET1D_TP_RULES = (
    (r"conv0/kernel$", _col_spec),
    (r"conv0/bias$", _col_spec),
    (r"conv1/kernel$", _row_spec),
)

# DiT transformer (models/dit.py): Megatron pairing inside each block —
# qkv and mlp_in column-sharded (per-head attention math and the GELU run
# on the sharded hidden axis), proj_out and mlp_out row-sharded (one psum
# each back to the replicated residual stream). The adaLN modulation
# projections (ada_mod/ada_out) stay replicated: their outputs multiply
# the replicated stream elementwise. patch_embed/head_out are thin I/O.
DIT_TP_RULES = (
    (r"(qkv|mlp_in)/kernel$", _col_spec),
    (r"(qkv|mlp_in)/bias$", _col_spec),
    (r"(proj_out|mlp_out)/kernel$", _row_spec),
)


def shard_params(variables, mesh: Mesh, rules, *, min_sharded: int = 1):
    """General tensor-parallel placement: place every param leaf according to
    the first rule whose regex matches its `/`-joined path (e.g.
    "params/core/down_res0/in_conv/kernel"); unmatched leaves are replicated.

    A rule is (pattern, spec) with spec a PartitionSpec or a callable
    leaf -> PartitionSpec (so one rule covers Dense and conv kernels of
    different ranks). Leaves whose matched axis is not divisible by the
    "model" axis size fall back to replicated. Raises if fewer than
    `min_sharded` leaves actually end up sharded — a renamed layer can
    therefore never silently turn TP into a no-op.
    """
    import re

    n_model = mesh.shape["model"]
    n_sharded = 0

    def _path_str(path):
        return "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )

    def place(path, x):
        nonlocal n_sharded
        name = _path_str(path)
        spec = P()
        for pattern, rule_spec in rules:
            if re.search(pattern, name):
                spec = rule_spec(x) if callable(rule_spec) else rule_spec
                break
        # divisibility guard: replicate rather than fail on odd widths
        for axis, part in enumerate(spec):
            if part is not None and x.shape[axis] % n_model != 0:
                spec = P()
                break
        if any(part is not None for part in spec):
            n_sharded += 1
        return jax.device_put(x, NamedSharding(mesh, spec))

    placed = jax.tree_util.tree_map_with_path(place, variables)
    if n_sharded < min_sharded:
        raise ValueError(
            f"shard_params: only {n_sharded} leaves matched the TP rules "
            f"(need >= {min_sharded}) — do the rule patterns still match the "
            "model's layer names?"
        )
    return placed


def shard_mlp_params(variables, mesh: Mesh):
    """Tensor-parallel placement for the MLP score net (see MLP_TP_RULES)."""
    return shard_params(variables, mesh, MLP_TP_RULES, min_sharded=4)


def shard_unet_params(variables, mesh: Mesh):
    """Tensor-parallel placement for the ADM U-Nets (see UNET_TP_RULES)."""
    return shard_params(variables, mesh, UNET_TP_RULES, min_sharded=4)


def shard_dit_params(variables, mesh: Mesh):
    """Tensor-parallel placement for the DiT score net (see DIT_TP_RULES)."""
    return shard_params(variables, mesh, DIT_TP_RULES, min_sharded=4)


def shard_unet1d_params(variables, mesh: Mesh):
    """Tensor-parallel placement for UNet1D (see UNET1D_TP_RULES)."""
    return shard_params(variables, mesh, UNET1D_TP_RULES, min_sharded=4)


def sharded_kernel_mean(x, y, mesh: Mesh, centered=False):
    """Mean Gaussian kernel over all pairs, rows of x sharded over "data".

    Each device computes its (N/D, M) kernel tile from the matmul expansion
    and contributes a psum-reduced partial sum over ICI. centered=True
    returns the mean of k−1 (expm1) — see eval.mmd.compute_kernel_mean.
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
        e = -sq / (dim * dim)
        k = jnp.expm1(e) if centered else jnp.exp(e)
        local = jnp.sum(k * vb[:, None])
        return jax.lax.psum(local, "data")

    return tile_sum(xp, y, valid) / (n * y.shape[0])


def sharded_mmd(x, y, mesh: Mesh):
    """MMD² with all three kernel means computed in mesh-sharded tiles
    (kernel parity with eval.mmd / reference quantitative_comparison.py;
    centered expm1 accumulation — see eval.mmd.compute_mmd's float32-
    cancellation note)."""
    kxx = sharded_kernel_mean(x, x, mesh, centered=True)
    kyy = sharded_kernel_mean(y, y, mesh, centered=True)
    kxy = sharded_kernel_mean(x, y, mesh, centered=True)
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
