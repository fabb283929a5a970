from diner_tpu.models.keypointnerf.model import (
    KeypointNeRF,
    KeypointNeRFConfig,
)

__all__ = ["KeypointNeRF", "KeypointNeRFConfig"]
