"""Camera pose estimator (reference reg_slices/src/model_cam_est.py:13-173).

VGG16-BN trunk -> 1024-d fc -> two branches: an ortho6d rotation head
(6d -> Gram-Schmidt rotation matrix) and a distance-ratio head
(sigmoid * 0.35 + 0.7).  The predicted inverse extrinsics are assembled
with the fixed Blender frame constants, and the training loss is the MSE
between a point cloud transformed by the predicted vs ground-truth
regression matrices.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import MLP
from .vgg import VGG16BNBackbone

__all__ = ["CameraNet", "rotation_from_ortho6d", "camera_pose_loss"]

CAM_MAX_DIST = 1.75
# numpy on purpose: see models/vgg.py IMAGENET_MEAN note
_R_OBJ2CAM_INV = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
_R_CAMFIX = np.diag(np.array([1.0, -1.0, -1.0], np.float32))
# canonical-frame inverse rotation (reference model_cam_est.py:140-143)
_ROT_MAT_INV = np.array(
    [[1.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 0.0],
     [0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]], np.float32
)


def rotation_from_ortho6d(poses: jnp.ndarray) -> jnp.ndarray:
    """(B, 6) -> (B, 3, 3) via Gram-Schmidt (Zhou et al. continuity repr)."""
    x_raw, y_raw = poses[:, :3], poses[:, 3:]

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    x = norm(x_raw)
    z = norm(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns x|y|z


class CameraNet(nn.Module):
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """img: (B, H, W, 3) -> predicted inverse extrinsics pieces."""
        _, final = VGG16BNBackbone(
            with_final=True, train_bn=self.train_bn,
            axis_name=self.axis_name, dtype=self.dtype, name="backbone",
        )(img)
        b = final.shape[0]
        feat = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc")(final.reshape(b, -1)))
        ortho6d = MLP((512, 256, 6), relu_last=False, dtype=self.dtype,
                      name="branch_ortho6d")(feat)
        dist = MLP((128, 64, 1), relu_last=False, dtype=self.dtype,
                   name="branch_dist")(feat)

        rot_inv = rotation_from_ortho6d(ortho6d.astype(jnp.float32))
        distance_ratio = jax.nn.sigmoid(dist.astype(jnp.float32)) * 0.35 + 0.7

        cam_loc = jnp.concatenate(
            [distance_ratio * CAM_MAX_DIST, jnp.zeros((b, 2))], axis=-1
        )[:, None, :]  # (B, 1, 3)
        trans_inv = -(cam_loc @ _R_OBJ2CAM_INV[None] @ _R_CAMFIX.T[None])
        pred_rt_inv = jnp.concatenate([rot_inv, trans_inv], axis=1)  # (B, 4, 3)
        return {
            "pred_rotation_mat_inv": rot_inv,
            "distance_ratio": distance_ratio[..., 0],
            "pred_RT_inv": pred_rt_inv,
        }


def camera_pose_loss(
    pred_rt_inv: jnp.ndarray,
    pcd: jnp.ndarray,
    regress_mat: jnp.ndarray,
    norm_mat_inv: jnp.ndarray,
    k: jnp.ndarray,
):
    """Point-cloud alignment MSE + predicted projection matrix
    (reference get_loss, model_cam_est.py:133-173)."""
    b, n, _ = pcd.shape
    homo = jnp.concatenate([pcd, jnp.ones((b, n, 1), pcd.dtype)], axis=-1)
    pred_regress = norm_mat_inv @ _ROT_MAT_INV[None] @ pred_rt_inv  # (B, 4, 3)
    diff = homo @ pred_regress - homo @ regress_mat
    loss = jnp.mean(diff ** 2)
    pred_trans_mat = jnp.swapaxes(k @ jnp.swapaxes(pred_regress, 1, 2), 1, 2)
    return loss, pred_trans_mat
