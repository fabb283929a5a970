from diner_tpu.renderer.renderer import (
    RendererConfig,
    RenderOutput,
    render_rays,
    render_rays_chunked,
)

__all__ = [
    "RendererConfig",
    "RenderOutput",
    "render_rays",
    "render_rays_chunked",
]
