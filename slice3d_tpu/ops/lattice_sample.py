"""Separable bilinear sampling for lattice query slabs (gather-free).

The reconstruct path's projection is rotation-free by construction — the
reference rotates the QUERY points and projects with
``trans_mat_wo_rot = K @ [I | t]`` (reg_slices/src/datasets.py:139,
src/models.py:28-34), where K is a no-skew pinhole.  Under that matrix
``u`` depends only on (x, z), ``v`` only on (y, z) and the perspective
divisor ``w`` only on z.  So for a FIXED-z slab of an axis-aligned query
lattice the projected coords form an exact tensor grid
``{u_i(x)} x {v_j(y)}`` — and bilinear sampling of a whole slab factors
into two small dense matmuls per pyramid level:

    out = A_v @ plane @ A_u^T        (per channel)

with ``A_u[(i, col)] = relu(1 - |px_i - col|)`` one-dimensional hat
weights.  Against the 4-corner row gather this moves each plane level
through the MXU once per slab instead of fetching 4 C-wide rows per
point: at the dense-eval operating point (129^3 lattice, 1536-ch packed
levels) the per-chunk HBM gather traffic (~25 KB/point) collapses into
~21 GFLOP of dense matmul per slab — the systolic array replaces the
random-access pattern entirely.

This is the separable factorization of ops/hat_sample.py (which builds
the full (M, h*w) Kronecker-product weight matrix and only wins on small
levels); the tensor-grid structure is what lets the Kronecker product
stay factored, making the approach exact AND cheap on every level.

No reference counterpart: the reference evaluates dense lattices through
the same per-point grid_sample gather as arbitrary points
(reg_slices/reconstruct.py:74-102).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hat_matrix_1d", "lattice_sample_sum", "projection_is_separable"]


def projection_is_separable(trans_mat_tp: np.ndarray, atol: float = 1e-6) -> bool:
    """True if ``uvw = [q, 1] @ trans_mat_tp`` has u independent of y,
    v independent of x, and w independent of both — the structure of the
    rotation-free reference projection that makes fixed-z lattice slabs
    sample on a tensor grid.  trans_mat_tp: (..., 4, 3); checked on host.
    """
    t = np.asarray(trans_mat_tp)
    return bool(
        np.all(np.abs(t[..., 1, 0]) <= atol)      # u: no y term
        and np.all(np.abs(t[..., 0, 1]) <= atol)  # v: no x term
        and np.all(np.abs(t[..., 0, 2]) <= atol)  # w: no x term
        and np.all(np.abs(t[..., 1, 2]) <= atol)  # w: no y term
    )


def hat_matrix_1d(p: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """p: (..., N) continuous pixel coords -> (..., N, n) hat weights.

    Rows for out-of-range coords attenuate to zero exactly like the
    valid-masked 4-corner gather (hat_sample._hat_weights semantics).
    """
    grid = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None].astype(jnp.float32) - grid))
    return w.astype(dtype)


def lattice_sample_sum(
    packed: Sequence[jnp.ndarray],
    u_nodes: jnp.ndarray,
    v_nodes: jnp.ndarray,
    n_slices: int,
    obj_index: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sample every packed level on the tensor grid and SUM the levels.

    packed: [(B, h, w, S*d)] folded planes (sdf_head.pack_planes layout);
    u_nodes: (b, Nx) normalized [-1, 1] u coords (one per lattice x);
    v_nodes: (b, Ny) likewise for lattice y.  Returns (b, Ny, Nx, S, d) —
    the same values ``sample_packed_sum`` produces for the M = Ny*Nx
    points of the slab, up to float reassociation.

    ``obj_index`` selects plane sets like sample_packed_sum's: shape (b,)
    maps node row i to plane set obj_index[i]; a SCALAR obj_index instead
    shares ONE plane set across every node row — the slab-group mode
    (rows = consecutive z-slabs of the same object), which contracts all
    G slabs' hat rows against the plane in a single (G*Ny, h) matmul
    without materializing G plane copies.
    """
    b = u_nodes.shape[0]
    shared = obj_index is not None and jnp.ndim(obj_index) == 0
    total = None
    for plane in packed:
        _, h, w, sd = plane.shape
        if shared:
            plane = jax.lax.dynamic_index_in_dim(
                plane, obj_index.astype(jnp.int32), 0, keepdims=False)
        elif obj_index is not None:
            plane = jnp.take(plane, obj_index.astype(jnp.int32), axis=0)
        px = (u_nodes.astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
        py = (v_nodes.astype(jnp.float32) + 1.0) * 0.5 * (h - 1)
        a_u = hat_matrix_1d(px, w, plane.dtype)  # (b, Nx, w)
        a_v = hat_matrix_1d(py, h, plane.dtype)  # (b, Ny, h)
        # contract plane rows (h) then columns (w); both land on the MXU
        if shared:
            tmp = jnp.einsum("gyh,hwc->gywc", a_v, plane)
        else:
            tmp = jnp.einsum("byh,bhwc->bywc", a_v, plane)
        s = jnp.einsum("bxw,bywc->byxc", a_u, tmp)
        total = s if total is None else total + s
    ny, nx = v_nodes.shape[1], u_nodes.shape[1]
    return total.reshape(b, ny, nx, n_slices, -1)
