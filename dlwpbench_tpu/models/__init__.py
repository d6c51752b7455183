"""Model zoo: importing this package populates the registry.

Registered `type` strings match the reference's config `model/*.yaml` values
(`models/__init__.py:4-15` in the reference) so configs translate 1:1.
"""

from dlwpbench_tpu.models import registry
from dlwpbench_tpu.models.registry import build_model, get_model_class, register
from dlwpbench_tpu.models.unet import UNet, UNetHPX

registry.register("UNet")(UNet)
registry.register("UNetHPX")(UNetHPX)
