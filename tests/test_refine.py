"""Mesh refinement: vertex polish reduces error on an analytic sphere."""

import numpy as np

import jax.numpy as jnp

from slice3d_tpu.mesh import isosurface
from slice3d_tpu.mesh.refine import refine_mesh

R = 0.3


def sphere_logit(p):
    # inside-positive pseudo-logit, smooth
    return (R - jnp.linalg.norm(p, axis=-1)) * 20.0


def test_refine_sphere_improves():
    # coarse marching mesh of the sphere (radius R in [-0.5, 0.5]^3)
    res = 16
    g = np.linspace(-0.5, 0.5, res + 1).astype(np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    grid = (R - np.sqrt(x * x + y * y + z * z)).astype(np.float32)
    mesh = isosurface(grid, 0.0)
    verts = (mesh.vertices / res - 0.5).astype(np.float32)

    def radial_err(v):
        return float(np.mean(np.abs(np.linalg.norm(v, axis=1) - R)))

    e0 = radial_err(verts)
    refined, losses = refine_mesh(
        verts, mesh.faces, sphere_logit, steps=50, lr=1e-3, threshold=0.5,
    )
    e1 = radial_err(refined)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert e1 < e0 * 0.9, (e0, e1)


def test_refine_noop_cases():
    v = np.zeros((3, 3), np.float32)
    out, losses = refine_mesh(v, np.zeros((0, 3), np.int64), sphere_logit)
    np.testing.assert_array_equal(out, v)
    out, losses = refine_mesh(
        v, np.array([[0, 1, 2]]), sphere_logit, steps=0)
    np.testing.assert_array_equal(out, v)
