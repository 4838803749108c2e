"""Blender camera projection chain for Slice3D datasets.

The Slice3D data layout stores, per shape, a ``meta.pkl`` with
``[K, azimuths, elevations, distances, cam_poses, scale_rand, offset_rand]``
produced by the Blender renderer.  At train/test time the model needs two
matrices derived from (azimuth, elevation, distance):

* ``obj_rot_mat``   — (3, 3) rotation taking canonical query points into the
  camera-aligned frame (applied as ``q @ obj_rot_mat``).
* ``trans_mat_wo_rot_tp`` — (4, 3) projection (intrinsics + the *constant*
  translation part of the extrinsics, rotation removed) applied to
  homogeneous camera-frame points as ``[q, 1] @ trans_mat_wo_rot_tp`` and
  followed by perspective division.

This reimplements the math of the reference pipeline
(reg_slices/src/utils.py:29-73,132-170 and reg_slices/src/datasets.py:122-140)
from the underlying geometry: a Blender camera with 35 mm focal length on a
32 mm sensor orbiting the origin at ``distance``, with the composite
"-pi/2 x-rotation" canonical-frame change folded into one rotation.

Everything here is plain NumPy (float64) — these matrices are computed once
per sample on the host and shipped to the device; none of this is in the hot
path.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "FOCAL_MM",
    "SENSOR_MM",
    "intrinsics",
    "blender_rt",
    "canonical_rot4",
    "camera_matrices",
    "sdf_sample_transform",
]

FOCAL_MM = 35.0
SENSOR_MM = 32.0

# Blender's camera-to-object frame change used by the renderer: the camera
# looks down -Z with +Y up; the dataset convention bakes this fixed rotation
# into the extrinsics (reference: reg_slices/src/utils.py:36-38).  The tiny
# off-axis terms (~4.4e-8) in the reference constant are float32 rounding of
# an exact permutation matrix; we keep the exact version.
_CAM_ROT = np.array(
    [
        [0.0, 0.0, 1.0],
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
    ]
)

# Flip y/z axes: Blender cameras look along -Z, image +Y is up, while the
# projection convention wants +Z forward / +Y down.
_CAM_FIX = np.diag([1.0, -1.0, -1.0])


def intrinsics(img_w: float = 1.0, img_h: float = 1.0) -> np.ndarray:
    """Pinhole intrinsics for the fixed 35mm/32mm Blender camera.

    With ``img_w = img_h = 1`` the projected coordinates land in [0, 1],
    which is what the grid-sampling path expects.
    """
    f_u = FOCAL_MM * img_w / SENSOR_MM
    f_v = FOCAL_MM * img_h / SENSOR_MM
    return np.array(
        [
            [f_u, 0.0, img_w / 2.0],
            [0.0, f_v, img_h / 2.0],
            [0.0, 0.0, 1.0],
        ]
    )


def blender_rt(az: float, el: float, distance: float) -> np.ndarray:
    """World→camera extrinsics ``[R | t]`` (3, 4) for an orbiting camera.

    ``az``/``el`` in radians, camera at ``distance`` from the origin.
    Matches the reference chain (reg_slices/src/utils.py:48-71): an
    azimuth/elevation rotation about the object, the fixed Blender frame
    change, and the y/z flip.
    """
    sa, ca = np.sin(-az), np.cos(-az)
    se, ce = np.sin(-el), np.cos(-el)
    # World→object orbit rotation (transpose of the object→world frame).
    r_world2obj = np.array(
        [
            [ca * ce, -sa, ca * se],
            [sa * ce, ca, sa * se],
            [-se, 0.0, ce],
        ]
    ).T
    r_obj2cam = _CAM_ROT.T
    rot = _CAM_FIX @ r_obj2cam @ r_world2obj
    trans = _CAM_FIX @ (-(r_obj2cam @ np.array([distance, 0.0, 0.0])))
    return np.concatenate([rot, trans[:, None]], axis=1)


def canonical_rot4() -> np.ndarray:
    """The fixed canonical-frame rotation (4, 4) applied to query points.

    The reference composes it as
    ``neg @ Rz(-pi/2) @ Rz(-pi/2) @ flip_y @ Rx(-pi/2)``
    (reg_slices/src/utils.py:170 with angle -pi/2).  The product collapses
    to the constant signed permutation below — mapping column vectors
    ``(x, y, z) -> (x, -z, y)``.
    """
    m = np.zeros((4, 4))
    m[0, 0] = 1.0
    m[1, 2] = -1.0
    m[2, 1] = 1.0
    m[3, 3] = 1.0
    return m


def camera_matrices(az_meta: float, el_meta: float, distance: float):
    """Compute (obj_rot_mat (3,3), trans_mat_wo_rot_tp (4,3)).

    ``az_meta``/``el_meta``/``distance`` are the raw values stored in
    ``meta.pkl`` (the dataset negates the stored azimuth before use,
    reference: reg_slices/src/datasets.py:127).

    Returns the two matrices in the "apply on the right" convention the
    models use: ``q_cam = q @ obj_rot_mat`` and
    ``uvw = [q_cam, 1] @ trans_mat_wo_rot_tp``.
    """
    az = -float(az_meta)
    el = float(el_meta)
    k = intrinsics(1.0, 1.0)
    rt = blender_rt(az, el, float(distance))

    rot_full = rt @ canonical_rot4()  # (3, 4)
    obj_rot_mat = rot_full.T[:3, :]  # transpose of the rotation block

    # Rotation-free projection: keep only the (constant) translation column.
    # rot_full[:, 3] does not depend on az/el for this camera rig.
    tmp = np.concatenate([np.eye(3), rot_full[:, 3:4]], axis=1)  # (3, 4)
    trans_mat_wo_rot = k @ tmp  # W2O shift is zero for this dataset
    return obj_rot_mat, trans_mat_wo_rot.T  # (3,3), (4,3)


def full_projection_matrix(az_meta: float, el_meta: float, distance: float) -> np.ndarray:
    """Transposed FULL projection (4, 3): K @ [RT @ canonical_rot].

    Used by the DISN baseline, which projects unrotated canonical points
    with the complete camera matrix (reference src/model_disn.py:85 fed by
    datasets_cam.py trans_mat_right).
    """
    az = -float(az_meta)
    k = intrinsics(1.0, 1.0)
    rt = blender_rt(az, float(el_meta), float(distance))
    return (k @ (rt @ canonical_rot4())).T


def sdf_sample_transform(points: np.ndarray, sdf: np.ndarray, scale: float, offset) -> tuple:
    """Apply the per-object random normalization recorded at render time.

    The renderer scaled the object by ``scale`` and shifted it by ``offset``
    (Blender frame); SDF samples live in the unscaled frame and were
    extracted at iso-level 0.003 (reference: reg_slices/src/datasets.py:146-148).
    Returns the rescaled (points, sdf).
    """
    offset = np.asarray(offset, dtype=np.float64)
    off = np.array([offset[0], offset[2], -offset[1]])
    pts = points * scale + off
    vals = (sdf - 0.003) * scale
    return pts, vals
