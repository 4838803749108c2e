"""Tests for simplification, point-in-mesh, and voxelization kernels."""

import numpy as np

from slice3d_tpu.mesh import (
    isosurface,
    points_inside_mesh,
    simplify_mesh,
    voxelize_mesh,
)


def sphere_mesh(n=32, radius=0.35):
    lin = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = radius - np.sqrt(x * x + y * y + z * z)
    mesh = isosurface(grid, 0.0)
    mesh.vertices = (mesh.vertices / (n - 1) - 0.5).astype(np.float32)
    return mesh


def test_simplify_reduces_faces_keeps_shape():
    mesh = sphere_mesh()
    target = len(mesh.faces) // 8
    simp = simplify_mesh(mesh, target)
    assert len(simp.faces) <= target * 1.2
    assert len(simp.faces) > 0
    r = np.linalg.norm(simp.vertices, axis=1)
    # simplified sphere stays near the sphere
    assert abs(np.median(r) - 0.35) < 0.02
    assert r.max() < 0.45 and r.min() > 0.2
    # volume preserved up to the inherent deficit of a coarse polyhedron
    tris = simp.vertices[simp.faces]
    vol = abs(np.einsum("ij,ij->i", tris[:, 0], np.cross(tris[:, 1], tris[:, 2])).sum() / 6)
    expect = 4 / 3 * np.pi * 0.35 ** 3
    assert abs(vol - expect) / expect < 0.15


def test_points_inside_sphere():
    mesh = sphere_mesh()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(2000, 3)).astype(np.float32)
    inside = points_inside_mesh(mesh, pts)
    r = np.linalg.norm(pts, axis=1)
    expect = r < 0.35
    # allow a thin shell of ambiguity near the surface
    confident = np.abs(r - 0.35) > 0.03
    agree = (inside == expect)[confident].mean()
    assert agree > 0.995


def test_iou_of_identical_spheres_is_one():
    from slice3d_tpu.eval.metrics import occupancy_iou

    mesh = sphere_mesh()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.5, 0.5, size=(1000, 3)).astype(np.float32)
    a = points_inside_mesh(mesh, pts)
    assert occupancy_iou(a, a) == 1.0


def test_voxelize_sat_not_aabb():
    """A diagonal triangle's AABB covers cells the triangle never touches:
    the SAT test must leave those empty (reference tribox2.h semantics; an
    AABB-only marker over-marks the far corner)."""
    from slice3d_tpu.mesh import Mesh

    verts = np.array(
        [[0.05, 0.05, 0.55], [0.95, 0.05, 0.55], [0.05, 0.95, 0.55]],
        dtype=np.float32,
    )
    faces = np.array([[0, 1, 2]], dtype=np.int64)
    occ = voxelize_mesh(Mesh(vertices=verts, faces=faces), 4)
    z = 2  # 0.55 * 4 = 2.2 -> z-slab index 2
    # cells along the legs are genuinely touched
    assert occ[0, 0, z] and occ[3, 0, z] and occ[0, 3, z]
    # the far corner cell spans x,y in [0.75,1]^2; min x+y = 1.5 > 1.0, so
    # the hypotenuse (x + y <= 1) never reaches it — AABB would mark it
    assert not occ[3, 3, z]
    # nothing outside the z-slab
    assert not occ[:, :, :z].any() and not occ[:, :, z + 1:].any()


def test_voxelize_sphere_shell():
    mesh = sphere_mesh()
    # map vertices from [-0.5, 0.5] to [0, 1]
    mesh.vertices = mesh.vertices + 0.5
    occ = voxelize_mesh(mesh, 24)
    assert occ.any()
    # center voxel is not on the surface shell
    assert not occ[12, 12, 12]
    # occupied voxels lie near radius 0.35
    idx = np.argwhere(occ)
    centers = (idx + 0.5) / 24 - 0.5
    r = np.linalg.norm(centers, axis=1)
    assert (np.abs(r - 0.35) < 0.08).mean() > 0.95


def test_obj_serialize_native_matches_python():
    """Native OBJ serializer is byte-identical to the Python formatter,
    including negative coords, -0.0, and 1-indexed faces."""
    from slice3d_tpu.mesh import Mesh, _obj_string_py, obj_string

    rng = np.random.default_rng(7)
    verts = (rng.normal(size=(997, 3)) * 0.7).astype(np.float32)
    verts[0] = [-0.0, 0.5, -0.5]
    faces = rng.integers(0, 997, (1501, 3)).astype(np.int64)
    mesh = Mesh(vertices=verts, faces=faces)
    assert obj_string(mesh) == _obj_string_py(mesh)
    assert obj_string(Mesh(np.zeros((0, 3), np.float32),
                           np.zeros((0, 3), np.int64))) == ""
