from sdeflow_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from sdeflow_tpu.parallel.sharding import (
    make_parallel_train_step,
    shard_mlp_params,
    sharded_kernel_mean,
    sharded_mmd,
    parallel_sample,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
    "shard_mlp_params",
    "sharded_kernel_mean",
    "sharded_mmd",
    "parallel_sample",
]
