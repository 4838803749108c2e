"""Pure math of the Blender slicing pipeline (no bpy) — unit-testable.

The bpy scripts (blender_script_input.py / blender_script_slices.py) are
unexecutable without a Blender binary, so everything load-bearing about
them lives here as plain numpy and is covered by tests/test_slicing_math.py:

* the orbiting camera's world matrix (Blender ``to_track_quat('-Z','Y')``
  look-at, reference blender_script_input.py camera rig);
* the world->camera vertex transform the slicer applies before cutting
  (reference blender_script_slices.py:262-272: every vertex is mapped by
  ``camera.matrix_world.inverted()`` so slabs are camera-aligned);
* the slab binning: 4 equal bins over the per-axis extent, with the
  coordinate list REVERSED for the Y and Z axes (reference :291-295
  ``if axis != 'X': slice_coord = slice_coord[::-1]``), so on disk
  ``X_1`` is the min-X slab while ``Y_1``/``Z_1`` are the max slabs;
* the camera reset trick for rendering slabs of the transformed mesh
  (reference reset_camera :345-361: camera moved to the origin, tracking
  the old origin's camera-frame position ``(0, 0, z0)``);
* the object normalization recipe shared with the input renderer
  (reference :363-394: unit body diagonal x scale_rand, bbox recentering
  + offset_rand).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

__all__ = [
    "camera_location",
    "track_minus_z_matrix",
    "camera_world_matrix",
    "world_to_camera",
    "slab_coords",
    "slab_interval",
    "reset_camera_target_z",
    "normalization_params",
]


def camera_location(az: float, el: float, dist: float) -> np.ndarray:
    """Orbit camera position (reference blender_script_input.py)."""
    return np.array([
        dist * math.cos(el) * math.cos(az),
        dist * math.cos(el) * math.sin(az),
        dist * math.sin(el),
    ])


def track_minus_z_matrix(track: np.ndarray, up_hint=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Rotation R (3x3, columns = object axes in world frame) such that the
    object's -Z axis points along ``track`` and +Y lies toward ``up_hint``
    — Blender's ``Vector.to_track_quat('-Z', 'Y')``."""
    t = np.asarray(track, np.float64)
    z_axis = -t / np.linalg.norm(t)  # object +Z is opposite the track dir
    up = np.asarray(up_hint, np.float64)
    x_axis = np.cross(up, z_axis)
    n = np.linalg.norm(x_axis)
    if n < 1e-12:  # track parallel to up: fall back to world X
        x_axis = np.array([1.0, 0.0, 0.0])
    else:
        x_axis = x_axis / n
    y_axis = np.cross(z_axis, x_axis)
    return np.stack([x_axis, y_axis, z_axis], axis=1)


def camera_world_matrix(az: float, el: float, dist: float) -> np.ndarray:
    """4x4 camera object->world matrix: orbit position + look-at-origin."""
    loc = camera_location(az, el, dist)
    rot = track_minus_z_matrix(-loc)
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = loc
    return m


def world_to_camera(verts: np.ndarray, az: float, el: float, dist: float) -> np.ndarray:
    """Map (N, 3) world vertices into the camera frame — the slicer's
    pre-cut transform (reference blender_script_slices.py:267-271)."""
    m_inv = np.linalg.inv(camera_world_matrix(az, el, dist))
    v = np.asarray(verts, np.float64)
    return v @ m_inv[:3, :3].T + m_inv[:3, 3]


def slab_coords(vmin: float, vmax: float, n: int, axis: str) -> List[float]:
    """The (n+1) bin-edge coordinates in slab-index order.

    Ascending for X; REVERSED (descending) for Y and Z (reference
    :291-295), so slab k spans ``coords[k-1]..coords[k]``.
    """
    step = (vmax - vmin) / n
    coords = [vmin + step * i for i in range(n + 1)]
    if axis != "X":
        coords = coords[::-1]
    return coords


def slab_interval(coords: List[float], k: int) -> Tuple[float, float]:
    """(lo, hi) world interval of slab ``k`` (1-based), lo < hi."""
    a, b = coords[k - 1], coords[k]
    return (a, b) if a <= b else (b, a)


def reset_camera_target_z(dist: float) -> float:
    """reset_camera math (reference :345-361): with the mesh transformed
    into the camera frame, the camera moves to the origin and tracks the
    world origin's camera-frame position (0, 0, z0).  For a camera at
    ``dist`` looking at the origin, z0 = -dist (depth along -Z)."""
    return -float(dist)


def normalization_params(bbox_min, bbox_max, scale_rand: float, offset_rand):
    """(scale, offset) the renderer applies to the raw mesh (reference
    :363-394): scale to unit body diagonal x scale_rand, then recenter the
    scaled bbox and add offset_rand."""
    bbox_min = np.asarray(bbox_min, np.float64)
    bbox_max = np.asarray(bbox_max, np.float64)
    diag = float(np.linalg.norm(bbox_max - bbox_min))
    scale = scale_rand / diag
    center = (bbox_min + bbox_max) / 2.0 * scale
    offset = -center + np.asarray(offset_rand, np.float64)
    return scale, offset
