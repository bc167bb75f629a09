from sdeflow_tpu.sde.base import beta_linear, SDEBehavior
from sdeflow_tpu.sde.sgm import SGMSde
from sdeflow_tpu.sde.msgm import MSGMSde
from sdeflow_tpu.sde.forward import ForwardFlow
from sdeflow_tpu.sde.reverse import PluginReverseSDE

__all__ = [
    "beta_linear",
    "SDEBehavior",
    "SGMSde",
    "MSGMSde",
    "ForwardFlow",
    "PluginReverseSDE",
]
