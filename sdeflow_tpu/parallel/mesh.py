"""Device mesh utilities.

The reference is strictly single-device (SURVEY.md §2 #19-20: no DP/TP/PP,
no NCCL/MPI — device selection is one cuda/mps/cpu string,
MSGM_higherDim.py:438-446). The TPU-native scaling design is:

- a 2-D `jax.sharding.Mesh` over ("data", "model"): batch data-parallelism
  over ICI as the primary axis, with an optional tensor axis for sharding
  wide layers,
- `jax.jit` with `NamedSharding` annotations — XLA inserts the psum for
  gradient reduction and the all-gathers for eval,
- collectives ride ICI within a slice; multi-slice runs put "data" on DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host initialization: call once per process before any jax op on
    a multi-host TPU slice (or multi-slice over DCN). Thin wrapper over
    `jax.distributed.initialize`, which auto-detects TPU pod environments
    when called with no arguments. After this, `jax.devices()` spans the
    whole slice and `make_mesh` builds a global mesh whose "data" axis
    collectives ride ICI within a slice and DCN across slices."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the data
    axis (pure DP)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data}x{n_model} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Place a (B, ...) array with the batch axis sharded over "data"."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
