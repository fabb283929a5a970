from diner_tpu.models.novel.model import (
    NovelPixelNeRF,
    NovelPixelNeRFConfig,
    GenContext,
)
from diner_tpu.models.novel.renderer import render_rays_novel

__all__ = ["NovelPixelNeRF", "NovelPixelNeRFConfig", "GenContext",
           "render_rays_novel"]
