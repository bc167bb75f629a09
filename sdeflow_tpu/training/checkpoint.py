"""Checkpoint / resume with full determinism capture.

The reference saves {iteration, model, optimizer, torch/numpy/python RNG
states} (reference: NN.py:13-42). In JAX the PRNG is an explicit key, so the
capture is just {TrainState, key, iteration} — saved via orbax, the
TPU-native async-capable checkpointer.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _abs(path):
    return os.path.abspath(path)


def checkpoint_exists(path) -> bool:
    wait_for_checkpoints()  # settle any in-flight async commit first
    return os.path.isdir(_abs(path))


# shared async-capable checkpointer: saves return after the device->host
# copy and commit in the background, overlapping with continued training
# (SURVEY.md §5's orbax-async equivalent of the reference's torch.save)
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def save_checkpoint(path, state, key, iteration, block=True) -> None:
    """Save {train state, PRNG key, iteration} (reference: NN.py:13-22).

    block=False schedules the save asynchronously (orbax background commit);
    call wait_for_checkpoints() before reading it back or exiting."""
    ckptr = _async_checkpointer()
    ckptr.save(
        _abs(path),
        dict(
            state=jax.device_get(state),
            key=jax.device_get(jax.random.key_data(key)),
            iteration=int(iteration),
        ),
        force=True,
    )
    if block:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until all scheduled async saves are committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path, state_template, key_template, shardings=None) -> Tuple:
    """Restore to the template's structure; returns (state, key, iteration)
    (reference: NN.py:24-42).

    shardings: optional pytree of `jax.sharding.Sharding` matching
    state_template. When given, the state is restored through orbax's
    sharding-aware path — each leaf materializes DIRECTLY on its mesh
    placement (one per-device slice read per shard), never staging the
    full parameter tree on the host or a single device. This is the scale
    path: params larger than one chip's HBM restore fine. The PRNG key is
    restored replicated over the same devices.
    """
    wait_for_checkpoints()
    key_data = jax.random.key_data(key_template)
    if shardings is None:
        restored = _async_checkpointer().restore(
            _abs(path),
            dict(state=state_template, key=key_data, iteration=0),
        )
    else:
        def _abstract(leaf, sharding):
            a = jnp.asarray(leaf)
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)

        # every sharding leaf spans the same device set; replicate the key
        # over it so the restored state and key live on the same mesh
        any_sharding = jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: isinstance(x, jax.sharding.Sharding)
        )[0]
        key_sharding = jax.sharding.NamedSharding(
            any_sharding.mesh, jax.sharding.PartitionSpec()
        )
        abstract = dict(
            state=jax.tree_util.tree_map(_abstract, state_template, shardings),
            key=jax.ShapeDtypeStruct(
                key_data.shape, key_data.dtype, sharding=key_sharding
            ),
            iteration=0,
        )
        restored = _async_checkpointer().restore(_abs(path), abstract)
    key = jax.random.wrap_key_data(restored["key"])
    return _restore_invariants(restored["state"]), key, int(restored["iteration"])


def _restore_invariants(state):
    """Re-establish eager pytree invariants a raw restore can't know about:
    MSGMSde.r_T must be sorted ascending (MSGMSde.create sorts it; the ecdf
    inverse-cdf interp in gen_radial_distribution relies on it, and a
    checkpoint written before that invariant existed holds unsorted norms —
    jnp.interp over unsorted values would silently corrupt the latent law).
    Sorting is idempotent and runs once, eagerly, at restore."""
    base = getattr(getattr(state, "gen_sde", None), "base_sde", None)
    if base is not None and hasattr(base, "r_T"):
        state = state.replace(
            gen_sde=state.gen_sde.replace(
                base_sde=base.replace(r_T=jnp.sort(base.r_T))
            )
        )
    return state


def delete_checkpoint(path) -> None:
    """Remove a rolling checkpoint after a fully successful run
    (reference: MSGM_higherDim.py:842-847). Waits for in-flight async saves
    so a background commit can't resurrect the directory after removal."""
    import shutil

    if checkpoint_exists(path):  # waits for pending async commits
        shutil.rmtree(_abs(path))
