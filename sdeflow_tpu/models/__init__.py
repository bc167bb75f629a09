from sdeflow_tpu.models.common import (
    normalize_log_radius,
    timestep_embedding,
    GroupNorm32,
    zero_init,
)
from sdeflow_tpu.models.dit import DiT1D, DiT2D
from sdeflow_tpu.models.mlp import MLP
from sdeflow_tpu.models.unet1d import UNet1D
from sdeflow_tpu.models.unet2d import UNetModel, ConditionalModel
from sdeflow_tpu.models.vorticity import VorticityUNet, flat_to_img, img_to_flat

__all__ = [
    "normalize_log_radius",
    "timestep_embedding",
    "GroupNorm32",
    "zero_init",
    "DiT1D",
    "DiT2D",
    "MLP",
    "UNet1D",
    "UNetModel",
    "ConditionalModel",
    "VorticityUNet",
    "flat_to_img",
    "img_to_flat",
]
