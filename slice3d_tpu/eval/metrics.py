"""Mesh evaluation metrics: Chamfer-L1/L2, F-score, Hausdorff, IoU.

The reference ships these as an offline library with no runner
(reg_slices/src/utils_eval.py, scipy cKDTree based).  Here the
nearest-neighbor reductions run on device: brute-force chunked pairwise
distances are a dense (chunk x N) matmul-adjacent workload that the MXU/VPU
handles far faster than a host KD-tree at eval scales (1e4-1e5 points).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sample_mesh_surface",
    "nn_distances",
    "chamfer_metrics",
    "hausdorff_distance",
    "occupancy_iou",
]


def sample_mesh_surface(vertices: np.ndarray, faces: np.ndarray, n: int,
                        seed: int = 0) -> np.ndarray:
    """Area-weighted uniform surface sampling -> (n, 3) float32."""
    rng = np.random.default_rng(seed)
    tris = vertices[faces]  # (F, 3, 3)
    cross = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    if area.sum() <= 0:
        return np.zeros((n, 3), np.float32)
    probs = area / area.sum()
    idx = rng.choice(len(faces), size=n, p=probs)
    u = rng.random((n, 1)).astype(np.float32)
    v = rng.random((n, 1)).astype(np.float32)
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tris[idx]
    pts = t[:, 0] + u * (t[:, 1] - t[:, 0]) + v * (t[:, 2] - t[:, 0])
    return pts.astype(np.float32)


@partial(jax.jit, static_argnames=("chunk",))
def _nn_dist_jit(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """For each point in a, squared distance to nearest point in b."""
    n = a.shape[0]
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    b_sq = jnp.sum(b * b, axis=1)

    def body(carry, a_chunk):
        d = (
            jnp.sum(a_chunk * a_chunk, axis=1, keepdims=True)
            - 2.0 * a_chunk @ b.T
            + b_sq[None, :]
        )
        return carry, jnp.min(d, axis=1)

    _, mins = jax.lax.scan(body, None, a_pad.reshape(n_chunks, chunk, 3))
    return jnp.maximum(mins.reshape(-1)[:n], 0.0)


def nn_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Euclidean nearest-neighbor distances from each a-point to b."""
    d2 = _nn_dist_jit(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    return np.sqrt(np.asarray(d2))


def chamfer_metrics(
    pred_pts: np.ndarray,
    gt_pts: np.ndarray,
    f_threshold: float = 0.01,
) -> Dict[str, float]:
    """Chamfer-L1/L2 + F-score/precision/recall (reference utils_eval.py:72-87)."""
    d_pred = nn_distances(pred_pts, gt_pts)  # pred -> gt  (precision side)
    d_gt = nn_distances(gt_pts, pred_pts)  # gt -> pred  (recall side)
    chamfer_l1 = 0.5 * (d_pred.mean() + d_gt.mean())
    chamfer_l2 = 0.5 * ((d_pred ** 2).mean() + (d_gt ** 2).mean())
    precision = float((d_pred < f_threshold).mean())
    recall = float((d_gt < f_threshold).mean())
    fscore = 2 * precision * recall / max(precision + recall, 1e-12)
    return {
        "chamfer_l1": float(chamfer_l1),
        "chamfer_l2": float(chamfer_l2),
        "precision": precision,
        "recall": recall,
        "fscore": fscore,
    }


def hausdorff_distance(a: np.ndarray, b: np.ndarray) -> float:
    return float(max(nn_distances(a, b).max(), nn_distances(b, a).max()))


def occupancy_iou(occ_pred: np.ndarray, occ_gt: np.ndarray) -> float:
    """IoU of boolean occupancies evaluated at shared sample points."""
    p = occ_pred.astype(bool)
    g = occ_gt.astype(bool)
    union = np.logical_or(p, g).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(p, g).sum() / union)
