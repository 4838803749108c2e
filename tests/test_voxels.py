import io

import numpy as np

from slice3d_tpu.mesh import isosurface
from slice3d_tpu.mesh.voxels import VoxelGrid, read_binvox, write_binvox


def sphere_mesh(n=32, radius=0.35):
    lin = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    mesh = isosurface(radius - np.sqrt(x * x + y * y + z * z), 0.0)
    mesh.vertices = (mesh.vertices / (n - 1) - 0.5).astype(np.float32)
    return mesh


def test_voxelgrid_from_mesh_contains():
    mesh = sphere_mesh()
    grid = VoxelGrid.from_mesh(mesh, 32)
    # center occupied (filled), corner empty
    assert grid.contains(np.array([[0.0, 0.0, 0.0]]))[0]
    assert not grid.contains(np.array([[0.49, 0.49, 0.49]]))[0]
    # volume roughly matches
    frac = grid.data.mean()
    expect = 4 / 3 * np.pi * 0.35 ** 3 / grid.scale ** 3
    assert abs(frac - expect) / expect < 0.35  # conservative shell inflates


def test_voxelgrid_to_mesh_roundtrip():
    mesh = sphere_mesh()
    grid = VoxelGrid.from_mesh(mesh, 24)
    back = grid.to_mesh()
    assert not back.is_empty
    r = np.linalg.norm(back.vertices, axis=1)
    assert abs(np.median(r) - 0.35) < 0.08


def test_binvox_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.random((16, 16, 16)) > 0.7
    grid = VoxelGrid(data=data, loc=np.array([0.1, 0.2, 0.3]), scale=2.0)
    buf = io.BytesIO()
    write_binvox(grid, buf)
    buf.seek(0)
    back = read_binvox(buf)
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_allclose(back.loc, grid.loc, atol=1e-6)
    assert back.scale == 2.0
