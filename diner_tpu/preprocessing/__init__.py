from diner_tpu.preprocessing.rasterize import rasterize_depth
from diner_tpu.preprocessing.facescape import (
    masked_downsampling,
    color_calibration_affine,
    apply_color_calibration,
)

__all__ = [
    "rasterize_depth",
    "masked_downsampling",
    "color_calibration_affine",
    "apply_color_calibration",
]
