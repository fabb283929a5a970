"""diner_tpu — a TPU-native (JAX/XLA/Pallas) differentiable-rendering framework.

Re-implements the full capability surface of the DINER reference codebase
(depth-aware image-based NeRF, CVPR 2023) as an idiomatic JAX framework:

- ``diner_tpu.geometry``   — rays, projections, depth→normal (pure JAX math)
- ``diner_tpu.ops``        — core kernels: grid_sample (incl. exponential
                             padding), depth-guided ray sampling, compositing
- ``diner_tpu.nn``         — flax modules: ResNet34 spatial encoder, ResnetFC,
                             positional encoding, VGG19 features
- ``diner_tpu.models``     — PixelNeRF conditioned field + SceneContext
- ``diner_tpu.renderer``   — functional volume renderer (depth-guided sampling)
- ``diner_tpu.losses``     — MSE / VGG perceptual / antibias losses
- ``diner_tpu.data``       — DTU / Facescape / Multiface loaders + synthetic
- ``diner_tpu.evaluation`` — PSNR/SSIM/LPIPS suite with the reference's folder
                             protocol
- ``diner_tpu.train``      — training loop, config system, checkpointing
- ``diner_tpu.parallel``   — mesh construction + sharded train/render steps
- ``diner_tpu.mvs``        — TransMVSNet-equivalent multi-view-stereo subsystem
- ``diner_tpu.fusion``     — depth-map fusion (C++/OpenMP, fusibile-equivalent)
"""

__version__ = "0.1.0"
