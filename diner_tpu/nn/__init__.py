from diner_tpu.nn.positional_encoding import PositionalEncoding, positional_encode
from diner_tpu.nn.resnetfc import ResnetFC
from diner_tpu.nn.resnet import ResNetEncoder
from diner_tpu.nn.spatial_encoder import SpatialEncoder, SpatialEncoderConfig

__all__ = [
    "PositionalEncoding",
    "positional_encode",
    "ResnetFC",
    "ResNetEncoder",
    "SpatialEncoder",
    "SpatialEncoderConfig",
]
