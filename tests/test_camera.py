"""Golden-value tests for the Blender camera projection chain.

Golden matrices were computed once by evaluating the reference math
(reg_slices/src/utils.py:29-73,132-170 + reg_slices/src/datasets.py:122-140)
numerically in float64 and freezing the results here.  The reference's
CAM_ROT constant carries ~4.4e-8 float32 noise; our implementation is exact,
so comparisons use a 1e-6 tolerance.
"""

import numpy as np
import pytest

from slice3d_tpu import camera


GOLDENS = [
    # (az_meta, el_meta, dist, obj_rot_mat, trans_mat_wo_rot_tp)
    (
        0.7853981,
        0.2617993,
        1.2,
        np.array(
            [
                [-0.7071067440, 0.1830125930, -0.6830127690],
                [0.0000000000, -0.9659258600, -0.2588189180],
                [-0.7071068180, -0.1830126310, 0.6830126830],
            ]
        ),
        np.array(
            [
                [1.09375, 0.0, 0.0],
                [0.0, 1.09375, 0.0],
                [0.5, 0.5, 1.0],
                [0.6, 0.6, 1.2],
            ]
        ),
    ),
    (
        2.1,
        -0.15,
        1.2,
        np.array(
            [
                [-0.8632093700, 0.0754432431, 0.4991772240],
                [0.0000000000, -0.9887710710, 0.1494381760],
                [0.5048460990, 0.1289964550, 0.8535164500],
            ]
        ),
        np.array(
            [
                [1.09375, 0.0, 0.0],
                [0.0, 1.09375, 0.0],
                [0.5, 0.5, 1.0],
                [0.6, 0.6, 1.2],
            ]
        ),
    ),
    (
        0.0,
        0.0,
        1.1,
        np.array(
            [
                [0.0, 0.0, -1.0],
                [0.0, -1.0, 0.0],
                [-1.0, 0.0, 0.0],
            ]
        ),
        np.array(
            [
                [1.09375, 0.0, 0.0],
                [0.0, 1.09375, 0.0],
                [0.5, 0.5, 1.0],
                [0.55, 0.55, 1.1],
            ]
        ),
    ),
]


@pytest.mark.parametrize("az,el,d,rot_gold,proj_gold", GOLDENS)
def test_camera_matrices_golden(az, el, d, rot_gold, proj_gold):
    rot, proj = camera.camera_matrices(az, el, d)
    np.testing.assert_allclose(rot, rot_gold, atol=1e-6)
    np.testing.assert_allclose(proj, proj_gold, atol=1e-6)


def test_rotation_is_orthonormal():
    rot, _ = camera.camera_matrices(1.234, 0.3, 1.2)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(rot) - 1.0) < 1e-12


def test_projection_centers_origin():
    # The origin must project to the image center (0.5, 0.5) at depth=dist.
    _, proj = camera.camera_matrices(0.42, -0.1, 1.2)
    uvw = np.array([0.0, 0.0, 0.0, 1.0]) @ proj
    xy = uvw[:2] / uvw[2]
    np.testing.assert_allclose(xy, [0.5, 0.5], atol=1e-12)
    assert abs(uvw[2] - 1.2) < 1e-12


def test_canonical_rot_is_signed_permutation():
    m = camera.canonical_rot4()
    v = m[:3, :3] @ np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(v, [1.0, -3.0, 2.0])


def test_sdf_sample_transform():
    pts = np.array([[0.1, 0.2, 0.3]])
    sdf = np.array([0.003])
    out_pts, out_sdf = camera.sdf_sample_transform(pts, sdf, 2.0, (0.5, 0.25, -0.125))
    # offset is remapped (ox, oz, -oy)
    np.testing.assert_allclose(out_pts, [[0.1 * 2 + 0.5, 0.2 * 2 - 0.125, 0.3 * 2 - 0.25]])
    # iso-level 0.003 maps to zero, then scales
    np.testing.assert_allclose(out_sdf, [0.0], atol=1e-12)
