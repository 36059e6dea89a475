"""Registry-facing builders: string TYPE -> renderer / model factories.

Parity surface for the reference's mmcv-style DI (lib/utils/builder.py:
MODEL / DATASET / RENDERER registries, build_renderer at
renderers/__init__.py:4, build_model_init at builder.py:320). The
functional core stays pytree-based; these are thin handles around it.
"""

from __future__ import annotations

from color_neus_tpu.models.configs import renderer_config_from_cfg
from color_neus_tpu.models import neus
from color_neus_tpu.utils.registry import RENDERER, MODEL


class RendererHandle:
    """cfg (reference RENDERER schema) -> init/apply handle."""

    def __init__(self, cfg: dict):
        self.rcfg = renderer_config_from_cfg(dict(cfg))

    def init(self, key):
        return neus.init_renderer(key, self.rcfg)

    def __call__(self, params, rays_o, rays_d, near, far, **kw):
        return neus.render_rays(params, self.rcfg, rays_o, rays_d, near, far, **kw)


RENDERER.register_module("NeuS")(RendererHandle)
RENDERER.register_module("Color_NeuS")(RendererHandle)


def build_renderer(cfg: dict) -> RendererHandle:
    """renderers/__init__.py:4-5 equivalent."""
    return RENDERER.build(cfg)


@MODEL.register_module("NeuS_Trainer")
class NeuSTrainerEntry:
    """MODEL-registry entry: builds the full training runtime from a
    top-level config (build_model_init semantics — dataset init data is
    loaded internally by TrainLoop)."""

    def __init__(self, cfg, **kwargs):
        from color_neus_tpu.runtime import TrainLoop
        self.loop = TrainLoop(cfg, **kwargs)

    def run(self, **kwargs):
        return self.loop.run(**kwargs)


def build_model(cfg, **kwargs):
    """builder.py:320-360 equivalent: cfg.MODEL.TYPE selects the entry."""
    return MODEL.get(cfg["MODEL"]["TYPE"])(cfg, **kwargs)
