"""GT-slices-to-3D model: regress an SDF from 12 given slice images.

Functional equivalent of the reference ``Slices3DGTModel``
(reg_slices/src/model_gt.py:12-111): a shared VGG16-BN encoder produces
5-level feature pyramids for each slice (1472 channels total), queries are
projected/sampled, and a 13-token transformer head outputs the SDF.

TPU-first split: :meth:`encode` runs once per object (12 images through the
CNN in one batched NHWC pass), :meth:`query` is the hot per-chunk function —
both jit-compiled, with no Python between refinement rounds.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .sdf_head import (
    SDFTransformerHead,
    maybe_quad_pack,
    pack_planes,
    prepare_queries,
    sample_packed_sum,
    sample_slice_pyramids,
)
from .vgg import VGG16BNBackbone
from ..ops import project_points

__all__ = ["GTSliceModel"]


class GTSliceModel(nn.Module):
    """12 slice images -> implicit SDF."""

    n_slices: int = 12
    fused_ffn: bool = False
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        self.img_encoder = VGG16BNBackbone(
            with_final=False,
            train_bn=self.train_bn,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="img_encoder",
        )
        self.head = SDFTransformerHead(
            point_mlp_features=(32, 64, 128),
            local_mlp_features=(128, 128),
            fused_ffn=self.fused_ffn,
            dtype=self.dtype,
            name="head",
        )

    def encode(self, img_slices: jnp.ndarray) -> Sequence[jnp.ndarray]:
        """img_slices: (B, S, H, W, 3) -> list of (B*S, h, w, c) pyramids."""
        b, s, h, w, c = img_slices.shape
        taps, _ = self.img_encoder(img_slices.reshape(b * s, h, w, c))
        return taps

    def query(
        self,
        pyramids: Sequence[jnp.ndarray],
        qry: jnp.ndarray,
        trans_mat_tp: jnp.ndarray,
    ) -> jnp.ndarray:
        """Evaluate SDF at camera-aligned points. qry: (B, M, 3) -> (B, M)."""
        uv = project_points(qry, trans_mat_tp)
        local = sample_slice_pyramids(pyramids, uv, self.n_slices)
        return self.head(qry, local)

    def encode_folded(self, img_slices: jnp.ndarray) -> Sequence[jnp.ndarray]:
        """Encode, fold the first local layer into the planes, and pack the
        slice axis into gather-friendly wide rows (inference)."""
        folded = self.head.fold_pyramids(self.encode(img_slices))
        return maybe_quad_pack(pack_planes(folded, self.n_slices))

    def query_folded(self, packed, qry, trans_mat_tp, obj_index=None) -> jnp.ndarray:
        """Fast query over folded packed planes — exact, far less gather
        traffic than the training path.  ``obj_index`` (b,) optionally maps
        each query row to a plane set (sequential batched pipeline)."""
        uv = project_points(qry, trans_mat_tp)
        sampled = sample_packed_sum(packed, uv, self.n_slices,
                                    obj_index=obj_index)
        return self.head.from_folded(qry, sampled)

    def query_presampled(self, qry, sampled) -> jnp.ndarray:
        """Head-only query on externally sampled folded features — the
        lattice-slab fast path (ops/lattice_sample.py) samples whole
        tensor-grid slabs with separable matmuls and feeds them here.
        qry: (B, M, 3) camera-aligned; sampled: (B, M, S, d)."""
        return self.head.from_folded(qry, sampled)

    def __call__(
        self,
        img_slices: jnp.ndarray,
        qry_norot: jnp.ndarray,
        trans_mat_tp: jnp.ndarray,
        obj_rot_mat: Optional[jnp.ndarray] = None,
        *,
        test_mode: bool = False,
    ) -> jnp.ndarray:
        """Full forward (training entry point). Returns sdf (B, M)."""
        qry = prepare_queries(qry_norot, obj_rot_mat, test_mode=test_mode)
        pyramids = self.encode(img_slices)
        return self.query(pyramids, qry, trans_mat_tp)
