from diner_tpu.geometry.rays import gen_rays
from diner_tpu.geometry.transforms import (
    world_to_cam,
    rotate_to_cam,
    project_points,
    uv_to_ndc,
    invert_pose,
    to_homogeneous,
)
from diner_tpu.geometry.normals import depth_to_normal

__all__ = [
    "gen_rays",
    "world_to_cam",
    "rotate_to_cam",
    "project_points",
    "uv_to_ndc",
    "invert_pose",
    "to_homogeneous",
    "depth_to_normal",
]
