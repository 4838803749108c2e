"""DISN baseline: single-view implicit SDF via local+global feature MLPs.

Functional equivalent of the reference ``DISNModel``
(reg_slices/src/model_disn.py:10-126): VGG16-BN multi-scale local features
(1472-d) sampled at the projected query location, a global image feature,
a 3->64->256->512 point MLP, and two MLP heads whose outputs sum to the SDF.

Note: the reference's ``fc_global`` expects a 1000-d global feature but the
encoder it imports produces 128 (vgg16bn_feats.py:38) — the model as shipped
cannot run.  We parameterize ``global_dim`` (default 128, the importable
configuration) and use the DISN-variant dropout-MLP global head
(vgg16bn_feats_for_disn.py:38-46) without dropout at eval.

DISN projects UNROTATED queries with the full camera matrix
(``trans_mat_right``) rather than Slice3D's rotation-free split.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import project_points
from .layers import MLP
from .sdf_head import sample_slice_pyramids
from .vgg import VGG16BNBackbone

__all__ = ["DISNModel"]


class DISNModel(nn.Module):
    global_dim: int = 128
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        self.img_encoder = VGG16BNBackbone(
            with_final=True, train_bn=self.train_bn,
            axis_name=self.axis_name, dtype=self.dtype, name="img_encoder",
        )
        self.global_head = MLP((1024, 1024, self.global_dim), relu_last=False,
                               dtype=self.dtype, name="global_head")
        self.pts_feat_extractor = MLP((64, 256, 512), relu_last=True,
                                      dtype=self.dtype, name="pts_feat_extractor")
        self.fc_local = MLP((512, 256, 1), relu_last=False,
                            dtype=self.dtype, name="fc_local")
        self.fc_global = MLP((512, 256, 1), relu_last=False,
                             dtype=self.dtype, name="fc_global")

    def encode(self, img_input: jnp.ndarray):
        """img_input: (B, H, W, 3) -> (pyramids, global (B, D))."""
        taps, final = self.img_encoder(img_input)
        b = final.shape[0]
        # adaptive 4x4 pool then flatten (NHWC order), as the DISN head does
        h, w = final.shape[1:3]
        if (h, w) != (4, 4):
            final = nn.avg_pool(final, (max(h // 4, 1), max(w // 4, 1)),
                                (max(h // 4, 1), max(w // 4, 1)))
        feat_global = self.global_head(final.reshape(b, -1))
        return taps, feat_global

    def query(self, pyramids, feat_global, qry_rot, qry_norot, trans_mat_right):
        uv = project_points(qry_norot, trans_mat_right)
        local = sample_slice_pyramids(pyramids, uv, n_slices=1)[:, :, 0, :]
        feat_qry = self.pts_feat_extractor(qry_rot)
        n_qry = qry_rot.shape[1]
        g = jnp.broadcast_to(feat_global[:, None, :],
                             (feat_global.shape[0], n_qry, feat_global.shape[-1]))
        local_q = jnp.concatenate([local, feat_qry], axis=-1)
        global_q = jnp.concatenate([g, feat_qry], axis=-1)
        sdf = self.fc_local(local_q) + self.fc_global(global_q)
        return sdf[..., 0].astype(jnp.float32)

    def __call__(self, img_input, qry_norot, trans_mat_right, obj_rot_mat):
        # DISN always rotates by the (GT or estimated) camera rotation and
        # projects the UNROTATED points with the full matrix — it has no
        # test-mode flip (reference model_disn.py:74-85).
        qry_rot = jnp.einsum("bmi,bij->bmj", qry_norot, obj_rot_mat)
        pyramids, feat_global = self.encode(img_input)
        return self.query(pyramids, feat_global, qry_rot, qry_norot, trans_mat_right)
