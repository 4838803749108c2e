"""Unit tests for the Blender slicing math (render_slices/slicing_math.py).

The bpy scripts cannot run here (no Blender binary), so the load-bearing
geometry — camera look-at, world->camera vertex transform, slab binning
with the reference's Y/Z coordinate reversal (reference
blender_script_slices.py:291-295), camera reset, and the normalization
recipe — is pinned as pure math.
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "render_slices"))

from slicing_math import (  # noqa: E402
    camera_location,
    camera_world_matrix,
    normalization_params,
    reset_camera_target_z,
    slab_coords,
    slab_interval,
    track_minus_z_matrix,
    world_to_camera,
)


def test_camera_looks_at_origin():
    for az, el, dist in [(0.0, 0.0, 1.2), (0.7, 0.3, 1.2), (3.0, -0.15, 2.0)]:
        m = camera_world_matrix(az, el, dist)
        r, loc = m[:3, :3], m[:3, 3]
        # orthonormal rotation
        np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-12)
        assert np.linalg.det(r) > 0.999
        # the camera's -Z axis points from loc toward the origin
        fwd = -r[:, 2]
        np.testing.assert_allclose(fwd, -loc / np.linalg.norm(loc), atol=1e-12)
        # +Y has a non-negative world-Z component (up hint) away from poles
        assert r[2, 1] >= -1e-12


def test_world_to_camera_depth_and_origin():
    az, el, dist = 0.9, 0.25, 1.2
    # the world origin sits on the optical axis at depth -dist
    np.testing.assert_allclose(
        world_to_camera(np.zeros((1, 3)), az, el, dist)[0],
        [0.0, 0.0, -dist], atol=1e-12)
    # the camera's own location maps to the camera-frame origin
    loc = camera_location(az, el, dist)
    np.testing.assert_allclose(
        world_to_camera(loc[None], az, el, dist)[0], np.zeros(3), atol=1e-12)
    # reset_camera target depth equals the origin's camera depth
    assert reset_camera_target_z(dist) == -dist


def test_world_to_camera_axes():
    # camera on +X axis (az=el=0): world +Y maps to camera +X (right),
    # world +Z maps to camera +Y (up), world +X maps to camera -Z (depth)
    p = world_to_camera(np.eye(3), 0.0, 0.0, 1.2)
    np.testing.assert_allclose(p[0], [0.0, 0.0, -0.2], atol=1e-12)  # +X
    np.testing.assert_allclose(p[1], [1.0, 0.0, -1.2], atol=1e-12)  # +Y
    np.testing.assert_allclose(p[2], [0.0, 1.0, -1.2], atol=1e-12)  # +Z


def test_track_quat_degenerate_pole():
    r = track_minus_z_matrix(np.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-12)


def test_slab_coords_x_ascending_yz_descending():
    """Reference :291-295: ``if axis != 'X': slice_coord = slice_coord[::-1]``
    — X_1 is the min slab, Y_1/Z_1 the max slabs."""
    cx = slab_coords(-1.0, 1.0, 4, "X")
    assert cx == [-1.0, -0.5, 0.0, 0.5, 1.0]
    for axis in ("Y", "Z"):
        c = slab_coords(-1.0, 1.0, 4, axis)
        assert c == [1.0, 0.5, 0.0, -0.5, -1.0]

    # slab 1 of X covers the minimum; slab 1 of Y/Z covers the maximum
    assert slab_interval(cx, 1) == (-1.0, -0.5)
    assert slab_interval(slab_coords(-1.0, 1.0, 4, "Y"), 1) == (0.5, 1.0)
    assert slab_interval(slab_coords(-1.0, 1.0, 4, "Z"), 4) == (-1.0, -0.5)


def test_slabs_partition_extent():
    for axis in ("X", "Y", "Z"):
        c = slab_coords(-0.3, 0.9, 4, axis)
        ivals = [slab_interval(c, k) for k in range(1, 5)]
        widths = [hi - lo for lo, hi in ivals]
        np.testing.assert_allclose(widths, [0.3] * 4, atol=1e-12)
        los = sorted(lo for lo, _ in ivals)
        assert math.isclose(los[0], -0.3)
        assert math.isclose(max(hi for _, hi in ivals), 0.9)


def test_dataset_reader_sequence_is_near_to_far():
    """The dataset reads X1-4, Z4-1, Y1-4 (reg_slices/src/datasets.py:
    106-120).  With the renderer's layout (X ascending, Y/Z descending)
    the Z sequence Z4..Z1 walks ascending camera-Z — i.e. far-to-near
    depth — while X walks left-to-right and Y top-to-bottom; each axis
    group is monotone, which is what the per-slice embeddings rely on."""
    cz = slab_coords(-1.0, 1.0, 4, "Z")
    seq = [slab_interval(cz, k)[0] for k in (4, 3, 2, 1)]  # reader order
    assert seq == sorted(seq)  # monotone ascending
    cy = slab_coords(-1.0, 1.0, 4, "Y")
    seq_y = [slab_interval(cy, k)[0] for k in (1, 2, 3, 4)]
    assert seq_y == sorted(seq_y, reverse=True)  # monotone descending


def test_normalization_params():
    rng = np.random.default_rng(0)
    bbox_min = rng.uniform(-3, 0, 3)
    bbox_max = bbox_min + rng.uniform(0.5, 2.0, 3)
    scale_rand = 0.93
    offset_rand = rng.uniform(-0.05, 0.05, 3)
    scale, offset = normalization_params(bbox_min, bbox_max, scale_rand,
                                         offset_rand)
    new_min = bbox_min * scale + offset
    new_max = bbox_max * scale + offset
    # unit body diagonal x scale_rand
    assert math.isclose(np.linalg.norm(new_max - new_min), scale_rand,
                        rel_tol=1e-12)
    # recentered + offset_rand
    np.testing.assert_allclose((new_min + new_max) / 2, offset_rand,
                               atol=1e-12)


def test_consistent_with_dataset_camera_chain():
    """The Blender camera world matrix (used by the renderers) and the
    golden-tested dataset projection chain (slice3d_tpu.camera.blender_rt,
    reference src/utils.py:29-73) describe the SAME camera: their
    rotations differ exactly by the documented y/z flip diag(1,-1,-1)
    (camera.py _CAM_FIX), and translations map consistently."""
    from slice3d_tpu import camera as cam

    flip = np.diag([1.0, -1.0, -1.0])
    for az_meta, el, dist in [(0.3, 0.2, 1.2), (2.1, -0.1, 1.5),
                              (5.9, 0.6, 1.2)]:
        rt = cam.blender_rt(-az_meta, el, dist)  # dataset negates azimuth
        m_inv = np.linalg.inv(camera_world_matrix(az_meta, el, dist))
        np.testing.assert_allclose(rt[:, :3], flip @ m_inv[:3, :3],
                                   atol=1e-12)
        np.testing.assert_allclose(rt[:, 3], flip @ m_inv[:3, 3],
                                   atol=1e-12)
