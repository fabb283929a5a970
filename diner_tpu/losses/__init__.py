from diner_tpu.losses.basic import mse_loss, l1_loss, antibias_loss
from diner_tpu.losses.vgg import (
    VGG19Features,
    init_vgg19_params,
    vgg_loss,
)

__all__ = [
    "mse_loss",
    "l1_loss",
    "antibias_loss",
    "VGG19Features",
    "init_vgg19_params",
    "vgg_loss",
]
