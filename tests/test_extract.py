"""Tests for coarse-to-fine grid refinement + mesh generation."""

import numpy as np

from slice3d_tpu.mesh.extract import (
    GridRefiner,
    MeshGenerator,
    _upsample2x,
    extract_mesh_from_grid,
)


def sphere_logits_pts(pts: np.ndarray, radius=0.3) -> np.ndarray:
    # "logit" convention: inside positive (like -sdf)
    return (radius - np.linalg.norm(pts, axis=-1)).astype(np.float32)


def sphere_logits(idx: np.ndarray, res: int, radius=0.3) -> np.ndarray:
    from slice3d_tpu.mesh.extract import lattice_to_points

    return sphere_logits_pts(lattice_to_points(idx, res), radius)


def test_upsample2x_linear_field():
    # trilinear upsampling of a linear field is exact
    n = 8
    lin = np.linspace(0, 1, n + 1, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = 2 * x - 3 * y + 0.5 * z
    up = _upsample2x(g)
    lin2 = np.linspace(0, 1, 2 * n + 1, dtype=np.float32)
    x2, y2, z2 = np.meshgrid(lin2, lin2, lin2, indexing="ij")
    np.testing.assert_allclose(up, 2 * x2 - 3 * y2 + 0.5 * z2, atol=1e-6)


def test_refiner_matches_dense():
    calls = {"n": 0}

    def ev(idx, res):
        calls["n"] += len(idx)
        return sphere_logits(idx, res)

    refiner = GridRefiner(resolution0=16, upsampling_steps=2, threshold=0.0, chunk_size=4096)
    grid = refiner.build(ev)
    res = 64
    assert grid.shape == (res + 1,) * 3

    dense_pts = refiner.lattice_points(res)
    dense = sphere_logits_pts(dense_pts).reshape(grid.shape)

    # Near the iso-surface the refined grid must hold exact values.
    band = np.abs(dense) < 0.5 / res
    np.testing.assert_allclose(grid[band], dense[band], atol=1e-6)
    # And it must agree in sign almost everywhere (trilinear fill elsewhere).
    assert ((grid > 0) == (dense > 0)).mean() > 0.999


def test_refiner_far_fewer_evals_than_dense():
    count = {"n": 0}

    def ev(idx, res):
        count["n"] += len(idx)
        return sphere_logits(idx, res)

    GridRefiner(resolution0=32, upsampling_steps=2, chunk_size=1 << 16).build(ev)
    dense = 129 ** 3
    assert count["n"] < dense / 3


def test_mesh_generator_end_to_end():
    gen = MeshGenerator(resolution0=32, upsampling_steps=1, threshold=0.5, chunk_size=8192)
    mesh, stats = gen.generate(sphere_logits)
    assert not mesh.is_empty
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(r) - 0.3) < 1.0 / 64
    assert stats["final_resolution"] == 64
    assert stats["n_points_evaluated"] > 0


def test_extract_world_mapping():
    # grid of a halfspace x > 0 at res 32: surface plane should be x=0
    n = 32
    lin = np.linspace(-0.5, 0.5, n + 1, dtype=np.float32)
    x = np.broadcast_to(lin[:, None, None], (n + 1, n + 1, n + 1)).copy()
    mesh = extract_mesh_from_grid(x, 0.0, 1.0)
    plane_x = mesh.vertices[:, 0]
    inner = mesh.vertices[(np.abs(mesh.vertices[:, 1]) < 0.4) & (np.abs(mesh.vertices[:, 2]) < 0.4)]
    assert np.abs(inner[np.abs(inner[:, 0]) < 0.1][:, 0]).max() < 1e-3


def test_native_refine_level_matches_numpy():
    from slice3d_tpu.mesh import refine_level
    from slice3d_tpu.mesh.extract import (
        _active_cells,
        _touched_lattice_mask,
        _upsample2x,
    )

    rng = np.random.default_rng(3)
    for n1, thr, dilate in ((17, 0.0, 1), (33, 0.1, 1), (9, -0.2, 2)):
        grid = rng.normal(size=(n1, n1, n1)).astype(np.float32)
        fine_n, idx_n = refine_level(grid, thr, dilate)
        active = _active_cells(grid, thr, dilate)
        mask = _touched_lattice_mask(active)
        fine_p = _upsample2x(grid)
        idx_p = np.flatnonzero(mask.reshape(-1)).astype(np.int32)
        np.testing.assert_allclose(fine_n, fine_p, atol=1e-6)
        np.testing.assert_array_equal(idx_n, idx_p)


def test_jnp_refine_twins_bit_exact():
    """Device-side (jnp) refinement-level math must match the numpy/native
    originals BIT-exactly — the fused-levels pipeline replays device
    scatters onto a host-upsampled grid and any f32 divergence would
    corrupt the final grid silently."""
    import numpy as np

    from slice3d_tpu.mesh.extract import (
        _active_cells, _touched_lattice_mask, _upsample2x, active_cells_jnp,
        touched_lattice_mask_jnp, upsample2x_jnp)

    rng = np.random.default_rng(7)
    for n in (9, 17):
        g = rng.normal(size=(n, n, n)).astype(np.float32)
        for dilate in (0, 1, 2):
            a_np = _active_cells(g, 0.1, dilate)
            assert (np.asarray(active_cells_jnp(g, 0.1, dilate)) == a_np).all()
        a_np = _active_cells(g, 0.1, 1)
        m_np = _touched_lattice_mask(a_np)
        assert (np.asarray(touched_lattice_mask_jnp(a_np)) == m_np).all()
        assert (np.asarray(upsample2x_jnp(g)) == _upsample2x(g)).all()
