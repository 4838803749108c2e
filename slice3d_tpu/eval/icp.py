"""Point-cloud ICP alignment for evaluation.

Role of the reference's vendored ``src_convonet/utils/icp.py`` (used to
align predicted and GT meshes before scoring when the reconstruction frame
is only known up to a rigid transform).  Nearest-neighbor queries run on
device through the same chunked brute-force kernel as the Chamfer metrics
(eval/metrics.py); the rigid estimation is the closed-form SVD solution
(Umeyama/Kabsch), written from the algorithm.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .metrics import nn_distances  # noqa: F401  (re-exported convenience)
from . import metrics as _metrics

__all__ = ["best_fit_transform", "icp"]


_nn_idx_jit = None


def _nearest_indices(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Index into b of the nearest neighbor of each point of a.

    The jitted kernel lives at module scope: every ICP iteration calls
    this with the same shapes, so a per-call ``jax.jit`` would recompile
    each time (fresh function object = fresh compile cache).
    """
    global _nn_idx_jit
    if _nn_idx_jit is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def nn_idx(a, b):
            b_sq = jnp.sum(b * b, axis=1)

            def body(carry, a_chunk):
                d = (jnp.sum(a_chunk * a_chunk, axis=1, keepdims=True)
                     - 2.0 * a_chunk @ b.T + b_sq[None, :])
                return carry, jnp.argmin(d, axis=1)

            _, idx = jax.lax.scan(body, None, a)
            return idx.reshape(-1)

        _nn_idx_jit = nn_idx

    chunk = 4096
    a = np.asarray(a, np.float32)
    n = a.shape[0]
    n_chunks = (n + chunk - 1) // chunk
    a_pad = np.pad(a, ((0, n_chunks * chunk - n), (0, 0)))
    idx = np.asarray(_nn_idx_jit(a_pad.reshape(n_chunks, chunk, 3),
                                 np.asarray(b, np.float32)))
    return idx[:n]


def best_fit_transform(a: np.ndarray, b: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Least-squares rigid transform mapping a -> b (same-length
    correspondences).  Returns (T (4,4), R (3,3), t (3,))."""
    ca, cb = a.mean(axis=0), b.mean(axis=0)
    aa, bb = a - ca, b - cb
    h = aa.T @ bb
    u, _, vt = np.linalg.svd(h)
    r = vt.T @ u.T
    if np.linalg.det(r) < 0:  # reflection -> rotation
        vt[-1] *= -1.0
        r = vt.T @ u.T
    t = cb - r @ ca
    tm = np.eye(4)
    tm[:3, :3] = r
    tm[:3, 3] = t
    return tm, r, t


def icp(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    max_iterations: int = 20,
    tolerance: float = 1e-6,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Iterative closest point: rigidly align src onto dst.

    Returns (T (4,4) mapping original src into dst's frame, final
    per-point NN distances, iterations used).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    cur = src.copy()
    prev_err = None
    it = 0
    for it in range(1, max_iterations + 1):
        idx = _nearest_indices(cur, dst)
        matched = dst[idx]
        _, r, t = best_fit_transform(cur, matched)
        cur = cur @ r.T + t
        err = float(np.mean(np.linalg.norm(cur - matched, axis=1)))
        if prev_err is not None and abs(prev_err - err) < tolerance:
            break
        prev_err = err
    tm, _, _ = best_fit_transform(src, cur)
    dists = _metrics.nn_distances(cur.astype(np.float32),
                                  dst.astype(np.float32))
    return tm, dists, it
