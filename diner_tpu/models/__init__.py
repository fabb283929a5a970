from diner_tpu.models.scene import SceneContext, index_latent
from diner_tpu.models.pixelnerf import PixelNeRF, PixelNeRFConfig

__all__ = ["SceneContext", "index_latent", "PixelNeRF", "PixelNeRFConfig"]
