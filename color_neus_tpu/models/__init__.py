"""Model layer: neural fields, renderers, camera nets, trainer."""

from color_neus_tpu.models import fields, camera, neus, color_neus, trainer, builders  # noqa: F401
from color_neus_tpu.models.configs import (  # noqa: F401
    SDFConfig,
    ColorConfig,
    RelightConfig,
    VarianceConfig,
    NeRFConfig,
    RendererConfig,
    renderer_config_from_cfg,
)
