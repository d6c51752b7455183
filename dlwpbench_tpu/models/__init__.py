"""Model zoo: importing this package populates the registry.

Registered `type` strings match the reference's config `model/*.yaml` values
(`models/__init__.py:4-15` in the reference) so configs translate 1:1.
"""

from dlwpbench_tpu.models import registry
from dlwpbench_tpu.models.registry import build_model, get_model_class, register
from dlwpbench_tpu.models.distana import DISTANA, DISTANAHPX
from dlwpbench_tpu.models.unet import UNet, UNetHPX
from dlwpbench_tpu.models.convlstm import ConvLSTM, ConvLSTMHPX
from dlwpbench_tpu.models.fno import FNO2DModule, TFNO2DModule
from dlwpbench_tpu.models.fourcastnet import FourCastNet
from dlwpbench_tpu.models.sfno import SFNO2DModule
from dlwpbench_tpu.models.swin import SwinTransformer, SwinTransformerHPX
from dlwpbench_tpu.models.pangu import PanguWeather
from dlwpbench_tpu.models.graphcast import GraphCastNet
from dlwpbench_tpu.models.mgn import MeshGraphNet
from dlwpbench_tpu.models.modern_unet import (
    DiffModernUNet,
    DiffMUNetHPX,
    ModernUNet,
    MUNetHPX,
)

for _name, _cls in {
    "UNet": UNet,
    "UNetHPX": UNetHPX,
    "DISTANA": DISTANA,
    "DISTANAHPX": DISTANAHPX,
    "ConvLSTM": ConvLSTM,
    "ConvLSTMHPX": ConvLSTMHPX,
    "FNO2DModule": FNO2DModule,
    "TFNO2DModule": TFNO2DModule,
    "FourCastNet": FourCastNet,
    "SFNO2DModule": SFNO2DModule,
    "SwinTransformer": SwinTransformer,
    "SwinTransformerHPX": SwinTransformerHPX,
    "PanguWeather": PanguWeather,
    "GraphCastNet": GraphCastNet,
    "FourCastNetv2": FourCastNet,  # filter="SFNO" via config
    "MeshGraphNet": MeshGraphNet,
    "ModernUNet": ModernUNet,
    "MUNetHPX": MUNetHPX,
    "DiffModernUNet": DiffModernUNet,
    "DiffMUNetHPX": DiffMUNetHPX,
}.items():
    registry.register(_name)(_cls)
