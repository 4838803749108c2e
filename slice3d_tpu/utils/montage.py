"""Slice montage IO: the on-disk interchange format of the generation path.

A montage is a (4*H, 4*W, 3) image: rows = slice groups [0-3, 4-7, 8-11,
zero pad], columns = the 4 parts, matching the reference's test_step grid
(gen_slices/ldm/models/diffusion/ddpm.py:368-397) and consumed by
re_org_slices.py.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

__all__ = ["slices_to_montage", "montage_to_slices", "save_image", "to_uint8"]


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return ((np.clip(img, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)


def slices_to_montage(slices: np.ndarray) -> np.ndarray:
    """(12, H, W, 3) in [-1,1] -> (4H, 4W, 3) float montage with pad row."""
    s, h, w, c = slices.shape
    if s != 12:
        raise ValueError("montage expects 12 slices")
    rows = [np.concatenate(list(slices[r * 4:(r + 1) * 4]), axis=1) for r in range(3)]
    rows.append(np.zeros_like(rows[0]))
    return np.concatenate(rows, axis=0)


def montage_to_slices(montage: np.ndarray, img_size: int) -> np.ndarray:
    """(>=3*img_size, 4*img_size, 3) -> (12, img_size, img_size, 3)."""
    out = []
    for r in range(3):
        for c in range(4):
            out.append(
                montage[r * img_size:(r + 1) * img_size,
                        c * img_size:(c + 1) * img_size]
            )
    return np.stack(out)


def save_image(img: np.ndarray, path: str) -> None:
    Image.fromarray(img).save(path)
