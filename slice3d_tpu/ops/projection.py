"""Perspective projection of query points onto the input image plane.

Matches the reference ``project_coord`` (reg_slices/src/models.py:28-36):
homogeneous points are multiplied on the right by the transposed
rotation-free projection matrix, perspective-divided, remapped from [0, 1]
to [-1, 1], and clamped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["project_points"]


def project_points(points: jnp.ndarray, trans_mat_tp: jnp.ndarray) -> jnp.ndarray:
    """Project 3D points to normalized image coordinates.

    Args:
      points: (B, M, 3) camera-aligned query points.
      trans_mat_tp: (B, 4, 3) transposed projection matrix
        (``trans_mat_wo_rot_tp`` from :mod:`slice3d_tpu.camera`).

    Returns:
      (B, M, 2) coordinates in [-1, 1] suitable for
      :func:`slice3d_tpu.ops.grid_sample_2d`.
    """
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    homo = jnp.concatenate([points, ones], axis=-1)  # (B, M, 4)
    # Full fp32 accumulation: projected pixel coords feed bilinear sampling,
    # where bf16 MXU rounding (~3e-3) would visibly shift sample taps.
    uvw = jnp.einsum(
        "bmi,bij->bmj", homo, trans_mat_tp, precision=jax.lax.Precision.HIGHEST
    )  # (B, M, 3)
    xy = uvw[..., :2] / uvw[..., 2:3]
    return jnp.clip(2.0 * (xy - 0.5), -1.0, 1.0)
