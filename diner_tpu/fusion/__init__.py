from diner_tpu.fusion.fusion import (
    fuse_depth_maps,
    build_library,
    write_ply,
    read_gipuma_dmb,
    write_gipuma_dmb,
)

__all__ = [
    "fuse_depth_maps",
    "build_library",
    "write_ply",
    "read_gipuma_dmb",
    "write_gipuma_dmb",
]
