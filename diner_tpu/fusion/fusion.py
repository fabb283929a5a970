"""ctypes bindings + helpers for the C++/OpenMP fusion library.

The native core reproduces the consistency semantics of the reference's
CUDA ``fusibile`` kernel; this module adds the gipuma driver protocol
(``deps/TransMVSNet/gipuma.py``): .dmb codec, probability filtering, PLY
output. The shared library is compiled on demand with g++ -O3 -fopenmp.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "src" / "fusion.cpp"
_LIB = Path(__file__).parent / "src" / "libdiner_fusion.so"
_lib_handle = None


def build_library(force: bool = False) -> Path:
    """Compile the shared library if needed (g++ -O3 -march=native -fopenmp)."""
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(str(build_library()))
        lib.fuse_depth_maps.restype = ctypes.c_longlong
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.fuse_depth_maps.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_void_p, f32p, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            f32p, ctypes.c_longlong,
        ]
        _lib_handle = lib
    return _lib_handle


def fuse_depth_maps(depths, normals, P, focals, colors=None,
                    disp_thresh: float = 0.25, normal_thresh: float = 0.52,
                    num_consistent: int = 3,
                    capacity: Optional[int] = None) -> np.ndarray:
    """Fuse per-view depth maps into a consistent point cloud.

    Args:
      depths: (V, H, W) float32 (0 = invalid).
      normals: (V, H, W, 3) float32 unit normals.
      P: (V, 3, 4) projection matrices K[R|t].
      focals: (V,) focal lengths (pixels).
      colors: optional (V, H, W, 3) float32 in [0, 1].
      disp_thresh / normal_thresh / num_consistent: fusibile parameters
        (defaults per gipuma driver / algorithmparameters.h).

    Returns:
      (N, 10) float32 [x y z nx ny nz r g b n_consistent].
    """
    lib = _load()
    depths = np.ascontiguousarray(depths, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    V, H, W = depths.shape
    P = np.ascontiguousarray(np.asarray(P, np.float32).reshape(V, 12))
    focals = np.ascontiguousarray(focals, np.float32)
    if capacity is None:
        capacity = int(V * H * W)
    out = np.empty((capacity, 10), np.float32)

    colors_ptr = None
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.float32)
        colors_ptr = colors.ctypes.data_as(ctypes.c_void_p)

    n = lib.fuse_depth_maps(V, H, W, depths, normals, colors_ptr, P, focals,
                            float(disp_thresh), float(normal_thresh),
                            int(num_consistent), out, capacity)
    if n < 0:
        raise RuntimeError("singular camera matrix in fusion")
    return out[:n]


# ------------------------------------------------------- gipuma protocol

def read_gipuma_dmb(path) -> np.ndarray:
    """Gipuma .dmb image (gipuma.py:20-31)."""
    with open(path, "rb") as f:
        _type, height, width, channels = struct.unpack("<iiii", f.read(16))
        arr = np.fromfile(f, np.float32)
    arr = arr.reshape((width, height, channels), order="F")
    return np.transpose(arr, (1, 0, 2)).squeeze()


def write_gipuma_dmb(path, image: np.ndarray):
    """Gipuma .dmb writer (gipuma.py:34-55)."""
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    ch = image.shape[2] if image.ndim == 3 else 1
    arr = np.transpose(image, (2, 0, 1)) if image.ndim == 3 else image
    with open(path, "wb") as f:
        f.write(struct.pack("<iiii", 1, h, w, ch))
        arr.astype(np.float32).tofile(f)


def probability_filter(depth: np.ndarray, prob: np.ndarray,
                       prob_threshold: float) -> np.ndarray:
    """Zero out depths below the confidence threshold (gipuma.py:153-167)."""
    out = depth.copy()
    out[prob < prob_threshold] = 0.0
    return out


def fake_normals(depth: np.ndarray) -> np.ndarray:
    """The gipuma driver's constant (1,1,1)/√3 normals masked by validity
    (gipuma.py:91-108); makes the normal test trivially pass."""
    n = np.full(depth.shape + (3,), 1.0 / 1.732050808, np.float32)
    return n * (depth > 0)[..., None]


def write_ply(path, points: np.ndarray, with_normals: bool = True,
              with_colors: bool = True):
    """Write fused points (N, >=10) as binary little-endian PLY."""
    n = len(points)
    props = ["x", "y", "z"]
    cols = [0, 1, 2]
    if with_normals:
        props += ["nx", "ny", "nz"]
        cols += [3, 4, 5]
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {p}" for p in props]
    if with_colors:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += ["end_header"]

    data = points[:, cols].astype("<f4")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if with_colors:
            rgb = np.clip(points[:, 6:9] * 255, 0, 255).astype(np.uint8)
            # interleave float properties and uchar colors row by row
            rec = np.dtype([("f", "<f4", (len(cols),)), ("c", "u1", (3,))])
            buf = np.empty(n, rec)
            buf["f"] = data
            buf["c"] = rgb
            buf.tofile(f)
        else:
            data.tofile(f)
