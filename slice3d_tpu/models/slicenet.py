"""SliceNet: single input view -> 12 slices + implicit SDF.

Functional equivalent of the reference ``Slices3DRegModel``
(reg_slices/src/models.py:12-94): the slice U-Net supplies both the
reconstructed slice images (supervised with L1 + VGG perceptual loss) and
the 992-channel multi-scale feature pyramid sampled at projected query
points; a 13-token transformer head regresses the SDF.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

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
from .unet_slices import SliceUNet
from ..ops import project_points

__all__ = ["SliceNetModel"]


class SliceNetModel(nn.Module):
    n_slices: int = 12
    fused_ffn: bool = False
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        self.slices_generator = SliceUNet(
            n_slices=self.n_slices,
            train_bn=self.train_bn,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="slices_generator",
        )
        self.head = SDFTransformerHead(
            point_mlp_features=(128,),   # fc_p: single Linear(3 -> 128)
            local_mlp_features=(128,),   # fc_s: single Linear(992 -> 128)
            fused_ffn=self.fused_ffn,
            dtype=self.dtype,
            name="head",
        )

    def encode(self, img_input: jnp.ndarray):
        """img_input: (B, H, W, 3) -> (pyramids, slices_rec (B*S, H, W, 3))."""
        return self.slices_generator(img_input)

    def query(
        self,
        pyramids: Sequence[jnp.ndarray],
        qry: jnp.ndarray,
        trans_mat_tp: jnp.ndarray,
    ) -> jnp.ndarray:
        uv = project_points(qry, trans_mat_tp)
        local = sample_slice_pyramids(pyramids, uv, self.n_slices)
        return self.head(qry, local)

    def encode_folded(self, img_input: jnp.ndarray):
        """Encode, fold fc_s into the planes, pack the slice axis.
        Returns (packed, slices_rec)."""
        pyramids, slices_rec = self.encode(img_input)
        folded = self.head.fold_pyramids(pyramids)
        packed = maybe_quad_pack(pack_planes(folded, self.n_slices))
        return packed, slices_rec

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
        img_input: jnp.ndarray,
        qry_norot: jnp.ndarray,
        trans_mat_tp: jnp.ndarray,
        obj_rot_mat: Optional[jnp.ndarray] = None,
        *,
        test_mode: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sdf (B, M), slices_rec (B*S, H, W, 3))."""
        qry = prepare_queries(qry_norot, obj_rot_mat, test_mode=test_mode)
        pyramids, slices_rec = self.encode(img_input)
        sdf = self.query(pyramids, qry, trans_mat_tp)
        return sdf, slices_rec
