"""Bilinear plane sampling as a dense hat-basis matmul (gather-free).

Bilinear interpolation with zero padding is a linear map of the plane:
``out[m] = sum_r W[m, r] * plane[r]`` where the weight of lattice row
``r = (yr, xr)`` is the separable hat product ``relu(1 - |px - xr|) *
relu(1 - |py - yr|)`` — at most 4 weights per point are non-zero, and
out-of-range points get all-zero weights (exactly the ``valid``-masked
4-corner gather in models/sdf_head.py::sample_packed_sum).

On TPU this turns the hot random-access gather into ONE dense (M, h*w) x
(h*w, C) matmul on the MXU.  For small pyramid levels the W matrix is
tiny (M x 64 .. M x 1024) and the matmul FLOPs are a fraction of the
SDF head's — while the per-point HBM traffic drops from 4 gathered
C-wide rows (~12 KB at C=1536) to one W row (0.1-2 KB).  For large
levels (h*w >= ~4k) the extra FLOPs overtake the saved bytes, so the
caller keeps the gather there (policy: ``hat_max_rows``).

No reference counterpart: the reference's F.grid_sample is a CUDA
gather kernel (reg_slices/src/models.py:66-77 samples per-level); this
reformulation is TPU-native (MXU systolic array beats random HBM access).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["hat_sample_sum"]


def _hat_weights(p: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """p: (B, M) continuous lattice coords -> (B, M, n) hat weights."""
    grid = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - grid))
    return w.astype(dtype)


def hat_sample_level(plane: jnp.ndarray, px: jnp.ndarray,
                     py: jnp.ndarray) -> jnp.ndarray:
    """Sample one packed plane by dense hat matmul.

    plane: (B, h, w, C); px/py: (B, M) pixel coords (align_corners=True
    scaling already applied).  Returns (B, M, C), zero for out-of-range
    points — bit-compatible semantics with the 4-corner gather path up to
    float reassociation.
    """
    b, h, w, c = plane.shape
    wx = _hat_weights(px, w, plane.dtype)          # (B, M, w)
    wy = _hat_weights(py, h, plane.dtype)          # (B, M, h)
    wmat = (wy[:, :, :, None] * wx[:, :, None, :]).reshape(b, -1, h * w)
    return jnp.einsum("bmr,brc->bmc", wmat, plane.reshape(b, h * w, c))


def hat_sample_sum(planes, uv: jnp.ndarray, obj_index=None,
                   max_rows: int = 2048):
    """Sum of bilinear samples over the levels routed to the hat path.

    planes: list of (B, h, w, C) packed planes; uv: (b, M, 2) in [-1, 1].
    Returns (total (b, M, C) or None, remaining_planes) — levels with
    ``h * w > max_rows`` are returned for the caller's gather path.
    """
    x = uv[..., 0].astype(jnp.float32)
    y = uv[..., 1].astype(jnp.float32)
    total = None
    rest = []
    for plane in planes:
        _, h, w, _ = plane.shape
        if h * w > max_rows:
            rest.append(plane)
            continue
        if obj_index is not None:
            plane = jnp.take(plane, obj_index.astype(jnp.int32), axis=0)
        px = (x + 1.0) * 0.5 * (w - 1)
        py = (y + 1.0) * 0.5 * (h - 1)
        s = hat_sample_level(plane, px, py)
        total = s if total is None else total + s
    return total, rest
