"""Analytic-SDF tests for the native isosurface extractors.

Parameterized over both methods: "surface_nets" (pipeline default) and
"tetrahedra" (exact edge-crossing vertices).
"""

import numpy as np
import pytest

from slice3d_tpu.mesh import isosurface as _isosurface, export_obj, Mesh


@pytest.fixture(params=["surface_nets", "tetrahedra"])
def isosurface(request):
    import functools

    return functools.partial(_isosurface, method=request.param)


def sphere_grid(n=48, radius=0.35):
    lin = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return radius - np.sqrt(x * x + y * y + z * z), lin


def test_sphere_surface_accuracy(isosurface):
    n = 48
    grid, lin = sphere_grid(n)
    mesh = isosurface(grid, 0.0)
    assert not mesh.is_empty
    # map lattice coords back to world
    verts = mesh.vertices / (n - 1) - 0.5
    r = np.linalg.norm(verts, axis=1)
    # all vertices within one cell of the true sphere
    cell = 1.0 / (n - 1)
    assert np.abs(r - 0.35).max() < cell
    assert np.abs(r - 0.35).mean() < cell / 4


def test_watertight_and_oriented(isosurface):
    grid, _ = sphere_grid(24)
    mesh = isosurface(grid, 0.0)
    # Every edge must be shared by exactly 2 faces with opposite direction
    # (watertight, consistently oriented 2-manifold).
    edges = {}
    for tri in mesh.faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    for (a, b), count in edges.items():
        assert count == 1, "duplicate directed edge -> inconsistent orientation"
        assert (b, a) in edges, "boundary edge -> not watertight"


def test_normals_point_outward(isosurface):
    n = 32
    grid, _ = sphere_grid(n)
    mesh = isosurface(grid, 0.0)
    v = mesh.vertices / (n - 1) - 0.5
    tris = v[mesh.faces]
    normals = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    centers = tris.mean(axis=1)
    # outward normal of a sphere points along the center direction
    agree = (normals * centers).sum(axis=1) > 0
    assert agree.mean() > 0.99


def test_volume_close_to_analytic(isosurface):
    n = 40
    grid, _ = sphere_grid(n)
    mesh = isosurface(grid, 0.0)
    v = mesh.vertices / (n - 1) - 0.5
    tris = v[mesh.faces]
    # signed volume via divergence theorem
    vol = np.abs(np.einsum("ij,ij->i", tris[:, 0], np.cross(tris[:, 1], tris[:, 2])).sum() / 6.0)
    expect = 4.0 / 3.0 * np.pi * 0.35 ** 3
    assert abs(vol - expect) / expect < 0.02


def test_empty_grid(isosurface):
    grid = -np.ones((8, 8, 8), np.float32)
    mesh = isosurface(grid, 0.0)
    assert mesh.is_empty


def test_export_obj(isosurface, tmp_path):
    grid, _ = sphere_grid(16)
    mesh = isosurface(grid, 0.0)
    path = tmp_path / "sphere.obj"
    export_obj(mesh, str(path))
    lines = path.read_text().splitlines()
    nv = sum(1 for l in lines if l.startswith("v "))
    nf = sum(1 for l in lines if l.startswith("f "))
    assert nv == len(mesh.vertices) and nf == len(mesh.faces)
