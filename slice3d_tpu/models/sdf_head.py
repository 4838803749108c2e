"""Shared implicit-SDF decoding machinery.

The Slice3D decoders all share one recipe (reference:
reg_slices/src/models.py:48-84 and src/model_gt.py:69-106):

  1. project camera-aligned query points onto the input image plane;
  2. bilinearly sample multi-scale per-slice feature pyramids at the
     projected 2D location;
  3. build 13 tokens — one query-point token + 12 per-slice feature
     tokens — and run a small post-LN transformer;
  4. read the query token and regress SDF with a linear head.

TPU design: encoding (CNN pyramids) is computed ONCE per object, and this
head is a pure function of (features, points) that jits to a single fused
program — projection, 4-corner gathers across all pyramid levels, token
MLPs and the 13-token transformer batched over the full query chunk on the
MXU.  The reference instead reruns its whole network per 3000-point chunk.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import grid_sample_2d, project_points
from .layers import MLP, TransformerEncoder

__all__ = ["sample_slice_pyramids", "SDFTransformerHead", "prepare_queries"]


def prepare_queries(qry_norot: jnp.ndarray, obj_rot_mat: Optional[jnp.ndarray], *, test_mode: bool) -> jnp.ndarray:
    """Map canonical-frame queries into the camera-aligned frame.

    Training uses the recorded object rotation; test mode (MISE grid
    queries) instead flips the y/z axes (reference: src/models.py:53-60).
    """
    if test_mode:
        return qry_norot * jnp.array([1.0, -1.0, -1.0], dtype=qry_norot.dtype)
    return jnp.einsum("bmi,bij->bmj", qry_norot, obj_rot_mat)


def sample_slice_pyramids(
    pyramids: Sequence[jnp.ndarray],
    uv: jnp.ndarray,
    n_slices: int,
) -> jnp.ndarray:
    """Sample every pyramid level of every slice at the projected coords.

    Args:
      pyramids: list of (B * n_slices, h_l, w_l, c_l) feature planes.
      uv: (B, M, 2) normalized image coordinates.
      n_slices: number of slice images per object.

    Returns:
      (B, M, n_slices, sum(c_l)) aggregated local features.
    """
    b, m, _ = uv.shape
    uv_tiled = jnp.repeat(uv, n_slices, axis=0)  # (B*n_slices, M, 2)
    sampled = [grid_sample_2d(p, uv_tiled) for p in pyramids]
    feat = jnp.concatenate(sampled, axis=-1)  # (B*S, M, C)
    feat = feat.reshape(b, n_slices, m, feat.shape[-1])
    return jnp.swapaxes(feat, 1, 2)  # (B, M, S, C)


class SDFTransformerHead(nn.Module):
    """Token transformer head: [query token; 12 slice tokens] -> SDF.

    ``point_mlp_features`` selects between the two reference variants:
    SliceNet uses a single Linear(3->128) (src/models.py:20), the GT-slice
    model a 3-layer ReLU MLP (src/model_gt.py:24-31).  Likewise
    ``local_mlp_features`` is one Linear for SliceNet (fc_s) and a 2-layer
    ReLU MLP for the GT model (fc_local).
    """

    d_model: int = 128
    n_layers: int = 3
    n_heads: int = 4
    point_mlp_features: Sequence[int] = (32, 64, 128)
    point_mlp_relu: bool = True
    local_mlp_features: Sequence[int] = (128, 128)
    local_mlp_relu: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, qry: jnp.ndarray, local_feats: jnp.ndarray) -> jnp.ndarray:
        """qry: (B, M, 3); local_feats: (B, M, S, C) -> sdf (B, M)."""
        if len(self.point_mlp_features) == 1:
            feat_qry = nn.Dense(self.point_mlp_features[0], dtype=self.dtype, name="fc_p")(qry)
        else:
            feat_qry = MLP(self.point_mlp_features, relu_last=self.point_mlp_relu,
                           dtype=self.dtype, name="pts_mlp")(qry)

        if len(self.local_mlp_features) == 1:
            feat_slice = nn.Dense(self.local_mlp_features[0], dtype=self.dtype, name="fc_s")(local_feats)
        else:
            feat_slice = MLP(self.local_mlp_features, relu_last=self.local_mlp_relu,
                             dtype=self.dtype, name="fc_local")(local_feats)

        tokens = jnp.concatenate([feat_qry[:, :, None, :], feat_slice], axis=2)
        # Only token 0 is read below, so the last layer's 16x-expansion FFN
        # runs on just that token — identical output, ~30% fewer head FLOPs.
        tokens = TransformerEncoder(
            num_layers=self.n_layers,
            d_model=self.d_model,
            n_heads=self.n_heads,
            final_head_tokens=1,
            dtype=self.dtype,
            name="att_decoder",
        )(tokens)
        sdf = nn.Dense(1, dtype=self.dtype, name="fc_out")(tokens[:, :, 0, :])
        return sdf[..., 0].astype(jnp.float32)


def decode_sdf(
    head: SDFTransformerHead,
    head_vars,
    pyramids: Sequence[jnp.ndarray],
    qry: jnp.ndarray,
    trans_mat_tp: jnp.ndarray,
    n_slices: int,
):
    """Functional SDF decode: project, sample, attend. Jit-friendly."""
    uv = project_points(qry, trans_mat_tp)
    local = sample_slice_pyramids(pyramids, uv, n_slices)
    return head.apply(head_vars, qry, local)
