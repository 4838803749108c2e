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

import jax
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


def pack_planes(planes: Sequence[jnp.ndarray], n_slices: int):
    """(B*S, h, w, d) planes -> [(B, h, w, S*d)] packed for wide-row gathers.

    One gathered row then carries ALL slices' features for a pixel — 12x
    fewer gather descriptors than per-slice sampling, and the output lands
    directly in (M, S, d) order (no transpose).  Done once per object.
    """
    packed = []
    for p in planes:
        bs, h, w, d = p.shape
        b = bs // n_slices
        q = p.reshape(b, n_slices, h, w, d)
        q = jnp.transpose(q, (0, 2, 3, 1, 4))  # (B, h, w, S, d)
        packed.append(q.reshape(b, h, w, n_slices * d))
    return packed


def quad_pack(plane: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C) -> (B, h, w, 4C) with row (y, x) carrying the 2x2 cell
    ``[p(y,x), p(y,x+1), p(y+1,x), p(y+1,x+1)]`` (zero-padded past the
    edge; edge rows are never gathered — cell origins clamp to w-2/h-2).

    One gathered 4C row then carries ALL FOUR bilinear corners: identical
    bytes moved per point as the 4-corner rows path, but 4x fewer gather
    descriptors and 4x larger DMAs — the round-4 gather ablation measured
    the 4x3KB row gathers 3.1x off bytes-SOL and attributed the gap to
    small-row DMA inefficiency, which this directly attacks.  Costs 4x
    plane storage on the quad-routed levels; built once per object at
    encode time.
    """
    zx = jnp.zeros_like(plane[:, :, :1])
    px1 = jnp.concatenate([plane[:, :, 1:], zx], axis=2)
    zy = jnp.zeros_like(plane[:, :1])
    py1 = jnp.concatenate([plane[:, 1:], zy], axis=1)
    pxy1 = jnp.concatenate([px1[:, 1:], jnp.zeros_like(px1[:, :1])], axis=1)
    return jnp.concatenate([plane, px1, py1, pxy1], axis=-1)


def _sample_quad(plane4: jnp.ndarray, px: jnp.ndarray,
                 py: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via ONE row gather of a quad-packed plane.

    plane4: (B, h, w, 4C) from :func:`quad_pack`; px/py: (B, M) pixel
    coords.  Returns (B, M, C).  Out-of-range coords reproduce zero
    padding via the separable edge-attenuation identity (see
    ``_sample_patch_gather``).
    """
    b, h, w, c4 = plane4.shape
    c = c4 // 4
    edge = (jnp.maximum(1.0 - jnp.abs(px - jnp.clip(px, 0, w - 1)), 0.0)
            * jnp.maximum(1.0 - jnp.abs(py - jnp.clip(py, 0, h - 1)), 0.0)
            ).astype(plane4.dtype)[..., None]
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    x0 = jnp.clip(jnp.floor(pxc), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(pyc), 0, max(h - 2, 0))
    wx = (pxc - x0).astype(plane4.dtype)[..., None]
    wy = (pyc - y0).astype(plane4.dtype)[..., None]
    flat = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32))
    rows = jnp.take_along_axis(plane4.reshape(b, h * w, c4),
                               flat[..., None], axis=1)  # (B, M, 4C)
    r00, r01, r10, r11 = (rows[..., :c], rows[..., c:2 * c],
                          rows[..., 2 * c:3 * c], rows[..., 3 * c:])
    top = r00 * (1 - wx) + r01 * wx
    bot = r10 * (1 - wx) + r11 * wx
    return (top * (1 - wy) + bot * wy) * edge


def _hat_max_rows_default() -> int:
    """Per-level routing policy: levels with h*w <= this sample via the
    dense hat-basis matmul (ops/hat_sample.py) instead of the 4-corner row
    gather.  Exact (same map, reassociated); on v5e the matmul beats the
    gather for the small levels (measured: see BASELINE.md hat ablation).
    Env knob SLICE3D_HAT_MAX_ROWS: 0 disables, large forces all levels."""
    import os

    return int(os.environ.get("SLICE3D_HAT_MAX_ROWS", "1024"))


def sample_packed_sum(
    packed: Sequence[jnp.ndarray],
    uv: jnp.ndarray,
    n_slices: int,
    obj_index: Optional[jnp.ndarray] = None,
    hat_max_rows: Optional[int] = None,
) -> jnp.ndarray:
    """Bilinearly sample packed planes at uv and SUM the levels.

    packed: [(B, h, w, S*d)]; uv: (b, M, 2) in [-1, 1] (align_corners=True,
    zero padding — matching grid_sample_2d).  Returns (b, M, S, d).

    ``obj_index`` (b,) int32 selects which plane set each uv row samples
    (default: row i samples plane set i, requiring b == B).  This lets a
    scan step evaluate ONE object's chunk against a stacked multi-object
    plane tensor — the single-chip batched pipeline walks objects
    sequentially so each step's gather working set stays one object's
    planes (per-point throughput measured ~1.5x the interleaved
    all-objects-per-step layout at B=8).  The selection is a plane-axis
    take feeding the same take_along_axis row gather as the default path
    — a flat-index variant (batch folded into the gather row axis with
    per-object offsets) measured 1.5x SLOWER at B=1 on v5e, the headline
    operating point, and was reverted.
    """
    b, m, _ = uv.shape
    x = uv[..., 0].astype(jnp.float32)
    y = uv[..., 1].astype(jnp.float32)

    from ..ops.hat_sample import hat_sample_sum

    if hat_max_rows is None:
        hat_max_rows = _hat_max_rows_default()
    total, packed = hat_sample_sum(packed, uv, obj_index=obj_index,
                                   max_rows=hat_max_rows)
    mode = _gather_mode_default()
    for plane in packed:
        _, h, w, sd = plane.shape
        if obj_index is not None:
            # row i of uv samples plane set obj_index[i]; at the b == 1
            # scan step this is a dynamic slice fused into the gather
            plane = jnp.take(plane, obj_index.astype(jnp.int32), axis=0)
        px = (x + 1.0) * 0.5 * (w - 1)
        py = (y + 1.0) * 0.5 * (h - 1)
        if mode == "quad":
            # plane is quad-packed (4C channels) by the encode path
            s = _sample_quad(plane, px, py)
            total = s if total is None else total + s
            continue
        if mode == "patch" and h >= 2 and w >= 2:
            # (2,2,C) slice_sizes require both plane dims >= 2; 1-wide
            # planes fall through to the rows path
            s = _sample_patch_gather(plane, px, py)
            total = s if total is None else total + s
            continue
        flat_plane = plane.reshape(b, h * w, sd)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = (px - x0).astype(plane.dtype)
        wy = (py - y0).astype(plane.dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(xi, yi, weight):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            weight = jnp.where(valid, weight, 0)
            flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            rows = jnp.take_along_axis(flat_plane, flat[..., None], axis=1)
            return rows * weight[..., None]

        s = (
            corner(x0i, y0i, (1 - wx) * (1 - wy))
            + corner(x0i + 1, y0i, wx * (1 - wy))
            + corner(x0i, y0i + 1, (1 - wx) * wy)
            + corner(x0i + 1, y0i + 1, wx * wy)
        )
        total = s if total is None else total + s
    return total.reshape(b, m, n_slices, -1)


def _gather_mode_default() -> str:
    """'rows' = four take_along_axis row gathers (round-3 default);
    'patch' = ONE lax.gather of a (2,2,C) corner patch per level (loses
    2.2x to rows on v5e — kept as a parity-tested study mode);
    'quad' = ONE take_along_axis row gather of a quad-packed plane (see
    :func:`quad_pack`; encode must pack with the same mode).  All three
    are exact (zero-padding semantics)."""
    import os

    return os.environ.get("SLICE3D_GATHER", "rows")


def maybe_quad_pack(packed, hat_max_rows: Optional[int] = None):
    """Apply :func:`quad_pack` to the gather-routed levels when the
    gather mode is 'quad' (encode-time counterpart of the sampling
    dispatch in :func:`sample_packed_sum` — both derive the same routing
    from plane shape + SLICE3D_GATHER/SLICE3D_HAT_MAX_ROWS)."""
    if _gather_mode_default() != "quad":
        return packed
    if hat_max_rows is None:
        hat_max_rows = _hat_max_rows_default()
    return [quad_pack(p) if p.shape[1] * p.shape[2] > hat_max_rows else p
            for p in packed]


def _sample_patch_gather(plane: jnp.ndarray, px: jnp.ndarray,
                         py: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via ONE (2,2,C) patch lax.gather per level.

    plane: (B, h, w, C); px/py: (B, M) pixel coords (align_corners scaling
    already applied).  Returns (B, M, C).  Out-of-range coords reproduce
    the rows path's zero-padding semantics via separable edge attenuation:
    zero-padded bilinear factors as hat(px)*hat(py), so sampling at the
    clamped coordinate and scaling by relu(1 - |px - clip(px)|) per axis
    is exact both in-range (factor 1) and in the one-pixel border band.
    """
    b, h, w, c = plane.shape
    edge = (jnp.maximum(1.0 - jnp.abs(px - jnp.clip(px, 0, w - 1)), 0.0)
            * jnp.maximum(1.0 - jnp.abs(py - jnp.clip(py, 0, h - 1)), 0.0)
            ).astype(plane.dtype)[..., None]
    px = jnp.clip(px, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)
    # clamp the patch origin so the 2x2 window stays in-bounds; the
    # recomputed fractional weights stay exact for in-range coords
    # (at px == w-1: x0 = w-2, wx = 1 -> full weight on the true corner)
    x0 = jnp.clip(jnp.floor(px), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(py), 0, max(h - 2, 0))
    wx = (px - x0).astype(plane.dtype)[..., None]
    wy = (py - y0).astype(plane.dtype)[..., None]
    starts = jnp.stack([y0, x0], axis=-1).astype(jnp.int32)  # (B, M, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def one(pl, st):
        return jax.lax.gather(
            pl, st, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )  # (M, 2, 2, C)

    patch = jax.vmap(one)(plane, starts)  # (B, M, 2, 2, C)
    top = patch[:, :, 0, 0] * (1 - wx) + patch[:, :, 0, 1] * wx
    bot = patch[:, :, 1, 0] * (1 - wx) + patch[:, :, 1, 1] * wx
    return (top * (1 - wy) + bot * wy) * edge


def sample_slice_pyramids_sum(
    planes: Sequence[jnp.ndarray],
    uv: jnp.ndarray,
    n_slices: int,
) -> jnp.ndarray:
    """Sample folded (equal-width) planes and SUM the levels.

    planes: list of (B * n_slices, h_l, w_l, d); uv: (B, M, 2).
    Returns (B, M, n_slices, d).  Used by the fast inference path — the sum
    equals the first local layer applied to the channel-concat.
    """
    return sample_packed_sum(pack_planes(planes, n_slices), uv, n_slices)


def sample_packed_sum_one(
    packed: Sequence[jnp.ndarray],
    uv: jnp.ndarray,
    n_slices: int,
    obj_index: jnp.ndarray,
) -> jnp.ndarray:
    """``sample_packed_sum`` for ONE object of a stacked plane tensor.

    uv: (1, M, 2); obj_index: () or (1,) scalar id into the B axis of the
    packed planes.  Scan-step helper for the sequential batched pipeline.
    """
    return sample_packed_sum(packed, uv, n_slices,
                             obj_index=jnp.reshape(obj_index, (1,)))


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

    Fast inference path: the first local Linear is *linear*, so it commutes
    with bilinear interpolation — :meth:`fold_pyramids` pre-multiplies the
    feature planes by it once per object, and :meth:`from_folded` consumes
    per-point 128-d sums instead of the (M, S, 992/1472) concat.  Exact
    (same params, reassociated), and the hot path moves 16x fewer bytes.
    """

    d_model: int = 128
    n_layers: int = 3
    n_heads: int = 4
    point_mlp_features: Sequence[int] = (32, 64, 128)
    point_mlp_relu: bool = True
    local_mlp_features: Sequence[int] = (128, 128)
    local_mlp_relu: bool = True
    fused_ffn: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        if len(self.point_mlp_features) == 1:
            self.fc_p = nn.Dense(self.point_mlp_features[0], dtype=self.dtype)
        else:
            self.pts_mlp = MLP(self.point_mlp_features, relu_last=self.point_mlp_relu,
                               dtype=self.dtype)
        if len(self.local_mlp_features) == 1:
            self.fc_s = nn.Dense(self.local_mlp_features[0], dtype=self.dtype)
        else:
            self.fc_local = MLP(self.local_mlp_features, relu_last=self.local_mlp_relu,
                                dtype=self.dtype)
        self.att_decoder = TransformerEncoder(
            num_layers=self.n_layers,
            d_model=self.d_model,
            n_heads=self.n_heads,
            final_head_tokens=1,
            fused_ffn=self.fused_ffn,
            dtype=self.dtype,
        )
        self.fc_out = nn.Dense(1, dtype=self.dtype)

    # -- shared pieces ------------------------------------------------------

    def _first_local(self, x):
        """First layer of the local feature transform (no activation)."""
        if len(self.local_mlp_features) == 1:
            return self.fc_s(x)
        return self.fc_local.first_layer(x)

    def _rest_local(self, x):
        """Everything after the first local layer."""
        if len(self.local_mlp_features) == 1:
            return x  # fc_s has no activation (reference models.py:80)
        return self.fc_local.after_first_layer(x)

    def _point_feat(self, qry):
        if len(self.point_mlp_features) == 1:
            return self.fc_p(qry)
        return self.pts_mlp(qry)

    def _decode_tokens(self, feat_qry, feat_slice):
        tokens = jnp.concatenate([feat_qry[:, :, None, :], feat_slice], axis=2)
        # Only token 0 is read below, so the last layer's 16x-expansion FFN
        # runs on just that token — identical output, ~30% fewer head FLOPs.
        tokens = self.att_decoder(tokens)
        sdf = self.fc_out(tokens[:, :, 0, :])
        return sdf[..., 0].astype(jnp.float32)

    # -- standard path -------------------------------------------------------

    def __call__(self, qry: jnp.ndarray, local_feats: jnp.ndarray) -> jnp.ndarray:
        """qry: (B, M, 3); local_feats: (B, M, S, C) -> sdf (B, M)."""
        feat_slice = self._rest_local(self._first_local(local_feats))
        return self._decode_tokens(self._point_feat(qry), feat_slice)

    # -- folded fast path ------------------------------------------------------

    def _first_local_params(self):
        """(kernel (C_total, d), bias (d,)) of the first local layer.

        Reads the bound submodule's variables directly — fold_pyramids only
        runs under apply() with loaded parameters.
        """
        mod = self.fc_s if len(self.local_mlp_features) == 1 else self.fc_local.layers[0]
        p = mod.variables["params"]
        return p["kernel"], p["bias"]

    def fold_pyramids(self, pyramids: Sequence[jnp.ndarray]) -> Sequence[jnp.ndarray]:
        """Pre-multiply each feature plane by its slice of the first local
        layer: (N, h, w, c_l) -> (N, h, w, d_model).  One-time per object.

        The layer bias rides on the FIRST level only, so summing the
        sampled levels reproduces ``W @ concat(levels) + b`` exactly (the
        model's projected coords are clamped in-range, so the bilinear
        weights of each sample sum to 1).
        """
        kernel, bias = self._first_local_params()
        outs = []
        offset = 0
        for i, p in enumerate(pyramids):
            c = p.shape[-1]
            w_slice = jax.lax.slice_in_dim(kernel, offset, offset + c, axis=0)
            folded = jnp.dot(p, w_slice.astype(p.dtype))
            if i == 0:
                folded = folded + bias.astype(folded.dtype)
            outs.append(folded)
            offset += c
        return outs

    def from_folded(self, qry: jnp.ndarray, sampled_sum: jnp.ndarray) -> jnp.ndarray:
        """qry: (B, M, 3); sampled_sum: (B, M, S, d) = per-point sum over
        levels of folded-plane samples (== first_local(concat(levels)))."""
        feat_slice = self._rest_local(sampled_sum)
        return self._decode_tokens(self._point_feat(qry), feat_slice)


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
