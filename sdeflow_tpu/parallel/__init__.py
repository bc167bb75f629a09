from sdeflow_tpu.parallel.mesh import make_mesh, shard_batch, replicate, init_distributed
from sdeflow_tpu.parallel.sharding import (
    make_parallel_train_step,
    make_parallel_train_chunk,
    shard_params,
    shard_mlp_params,
    shard_unet_params,
    shard_unet1d_params,
    MLP_TP_RULES,
    UNET_TP_RULES,
    UNET1D_TP_RULES,
    sharded_kernel_mean,
    sharded_mmd,
    parallel_sample,
)
from sdeflow_tpu.parallel.ring import ring_attention

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
    "make_parallel_train_chunk",
    "init_distributed",
    "shard_params",
    "shard_mlp_params",
    "shard_unet_params",
    "shard_unet1d_params",
    "MLP_TP_RULES",
    "UNET_TP_RULES",
    "UNET1D_TP_RULES",
    "sharded_kernel_mean",
    "sharded_mmd",
    "parallel_sample",
    "ring_attention",
]
