"""Device/host reconstruction pipeline: image(s) -> SDF grid -> mesh.

Ties a slice model (SliceNet / GTSlice / DISN), the coarse-to-fine grid
refiner, and the native isosurfacer together.  The feature pyramids are
encoded ONCE per object and kept on device; the per-chunk SDF query is a
single jit-compiled program of fixed shape (compiled once, reused across
all refinement rounds and objects).

Batched + multi-device operation (the reference's Generator3D loop at
reg_slices/reconstruct.py:378-415 is strictly serial, single-GPU):

* ``batch_size B > 1`` runs B objects through encode and every SDF query
  dispatch together — the 13-token attention head and the conv trunks are
  far from saturating one chip at batch 1, so this is nearly free
  throughput.  Each refinement level stays ONE device dispatch for the
  whole batch (per-object index lists padded to a common chunk grid).
* ``mesh=`` shards that object batch over the mesh's ``data`` axis with
  ``jax.sharding.NamedSharding`` — the SDF query axis is embarrassingly
  parallel (SURVEY §2.5/§5), so no collectives are needed and scaling is
  linear in chips.  The same jitted program serves 1 and N devices.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import Mesh
from .mesh.extract import MeshGenerator
from .models.disn import DISNModel
from .models.slicenet import SliceNetModel

__all__ = ["Reconstructor"]


class Reconstructor:
    """Generator3D equivalent (reference reg_slices/reconstruct.py:24-173).

    Args:
      model: a model module exposing ``encode``/``query`` methods.
      variables: flax variables for the model.
      resolution0/upsampling_steps/threshold/chunk_size: MISE-compatible
        operating point (reference options.py:45-48).
      batch_size: objects evaluated together per device dispatch.
      mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis; what
        shards over it is picked by ``shard_axis``.
      shard_axis: ``"batch"`` (throughput: objects shard over the mesh,
        batch_size must be divisible by the data axis size) or
        ``"points"`` (latency: the SDF query-point axis of EVERY chunk
        shards over the mesh with planes replicated — SURVEY §2.5's
        "shard SDF query chunks"; works at batch_size 1, chunk_size must
        be divisible by the data axis size).
    """

    def __init__(
        self,
        model,
        variables,
        *,
        resolution0: int = 64,
        upsampling_steps: int = 2,
        threshold: float = 0.5,
        chunk_size: int = 32768,
        box_size: float = 1.0,
        simplify_nfaces: int = 0,
        refine_steps: int = 0,
        batch_size: int = 1,
        mesh=None,
        extract_method: str = "surface_nets",
        transport_dtype: str = "float16",
        fuse_levels: bool = False,
        shard_axis: str = "batch",
    ):
        self.model = model
        self.simplify_nfaces = simplify_nfaces
        self.refine_steps = refine_steps
        self.chunk_size = chunk_size
        self.batch_size = int(batch_size)
        self.mesh = mesh
        self.generator = MeshGenerator(
            resolution0=resolution0,
            upsampling_steps=upsampling_steps,
            threshold=threshold,
            chunk_size=chunk_size,
            box_size=box_size,
            method=extract_method,
        )

        if shard_axis not in ("batch", "points"):
            raise ValueError(f"unknown shard_axis {shard_axis!r}")
        self.shard_axis = shard_axis
        shard_points = False  # constrain in-jit point chunks to the mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sh_repl = NamedSharding(mesh, P())
            if shard_axis == "points":
                # latency mode: replicate objects/planes, split each
                # chunk's POINT axis across the mesh — the query is
                # pointwise, so GSPMD partitions the gather+head compute
                # with no collectives beyond the value reassembly
                if chunk_size % mesh.shape["data"] != 0:
                    raise ValueError(
                        f"chunk_size {chunk_size} not divisible by data "
                        f"axis size {mesh.shape['data']}")
                self._sh_batch = self._sh_repl
                self._sh_chunks = NamedSharding(mesh, P(None, None, "data"))
                shard_points = True
            else:
                if self.batch_size % mesh.shape["data"] != 0:
                    raise ValueError(
                        f"batch_size {batch_size} not divisible by data "
                        f"axis size {mesh.shape['data']}")
                self._sh_batch = NamedSharding(mesh, P("data"))
                self._sh_chunks = NamedSharding(mesh, P(None, "data"))
            variables = jax.device_put(variables, self._sh_repl)
        self.variables = variables

        is_slicenet = isinstance(model, SliceNetModel)
        is_disn = isinstance(model, DISNModel)

        # refine_mesh differentiates through the query: route it around the
        # Pallas fused encoder (no autodiff rule) via a non-fused clone that
        # shares the exact same parameter structure.
        model_diff = (model.clone(fused_ffn=False)
                      if getattr(model, "fused_ffn", False) else model)

        def lattice_pts(idx, res):
            # lattice index -> world coords on device (cheap) — the host
            # only ships int32 indices, 3x less traffic than xyz floats
            n = res + 1
            z = idx % n
            y = (idx // n) % n
            x = idx // (n * n)
            pts = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
            return (pts / res - 0.5) * box_size

        @jax.jit
        def encode_fn(variables, imgs):
            # folded planes: the head's first local Linear is pre-applied so
            # the per-query path samples 128-ch planes (see sdf_head)
            method = model.encode if is_disn else model.encode_folded
            return model.apply(variables, imgs, method=method)

        # Batch-native query: pts (B, M, 3) -> values (B, M).
        if is_disn:

            def make_query_pts(m):
                def query_pts(variables, encoded, pts, trans_right, obj_rot):
                    pyramids, feat_global = encoded
                    qry_rot = jnp.einsum("bmi,bij->bmj", pts, obj_rot)
                    sdf = m.apply(
                        variables, pyramids, feat_global, qry_rot, pts,
                        trans_right, method=m.query,
                    )
                    return -sdf

                return query_pts

        else:

            def make_query_pts(m):
                def query_pts(variables, packed, pts, trans_tp):
                    # test-mode canonical->camera mapping: flip y/z
                    # (models.py:53-56)
                    qry = pts * jnp.array([1.0, -1.0, -1.0], dtype=pts.dtype)
                    sdf = m.apply(
                        variables, packed, qry, trans_tp,
                        method=m.query_folded,
                    )
                    return -sdf  # logit convention: inside positive

                return query_pts

        if not is_disn:
            # variant that also threads the plane-set selector through
            # query_folded (sequential batched layout, see query_seq)
            def query_pts_at(variables, packed, pts, trans_tp, obj_index):
                qry = pts * jnp.array([1.0, -1.0, -1.0], dtype=pts.dtype)
                sdf = model.apply(variables, packed, qry, trans_tp,
                                  obj_index, method=model.query_folded)
                return -sdf

        query_pts_fast = make_query_pts(model)       # fused hot path
        query_pts_diff = make_query_pts(model_diff)  # autodiff-safe (refine)

        # Values cross the (slow, tunneled) wire once per level: ship them
        # at reduced precision — the model computes in bfloat16 anyway, so
        # float16 transport only quantizes fp32 head noise (~1e-3 of a
        # lattice cell on crossing positions).
        wire_dtype = jnp.dtype(transport_dtype)

        def query_row(variables, encoded, idx, res, extras):
            # one fixed-size chunk of flat lattice indices -> values;
            # idx (B, c) -> (B, c)
            vals = query_pts_fast(variables, encoded, lattice_pts(idx, res),
                                  *extras)
            return vals.astype(wire_dtype)

        # One device dispatch per refinement level: lax.scan over (k, B, c)
        # index chunks.  On a tunneled chip each dispatch is ~100 ms of RPC
        # overhead vs ~14 ms of compute per 64k chunk, so per-chunk host
        # calls sit 8x off the wire-limited optimum.  jit re-specializes per
        # distinct k (rounded to powers of two to bound compile count).
        @jax.jit
        def query_many(variables, encoded, idx3d, res, *extras):
            def body(carry, idx):
                return carry, query_row(variables, encoded, idx, res, extras)

            _, vals = jax.lax.scan(body, 0, idx3d)  # (k, B, c)
            b = idx3d.shape[1]
            return jnp.transpose(vals, (1, 0, 2)).reshape(b, -1)

        # Sequential batched layout (single device, slicenet/gtslice): the
        # scan walks per-OBJECT chunks — xs is (idx (c,), obj_id ()) — so
        # each step's gathers touch only one object's planes.  Measured at
        # B=8/256^3: interleaving all objects into every step (the (k, B,
        # c) layout above) drops per-point throughput from ~1.05 to ~0.69
        # M pts/s on v5e purely from the 8x gather working set; this
        # layout keeps the single-object locality AND the one-dispatch-
        # per-level wire profile.
        if not is_disn:

            def query_row_seq(variables, encoded, idx, oid, res, extras):
                pts = lattice_pts(idx, res)[None]  # (1, c, 3)
                extras_b = tuple(
                    jax.lax.dynamic_index_in_dim(e, oid, 0, keepdims=True)
                    for e in extras)
                vals = query_pts_at(variables, encoded, pts, *extras_b,
                                    obj_index=jnp.reshape(oid, (1,)))
                return vals[0].astype(wire_dtype)

            @jax.jit
            def query_seq(variables, encoded, idx2d, oids, res, *extras):
                def body(carry, xs):
                    idx, oid = xs
                    return carry, query_row_seq(variables, encoded, idx, oid,
                                                res, extras)

                _, vals = jax.lax.scan(body, 0, (idx2d, oids))  # (k, c)
                return vals.reshape(-1)

            self._query_seq = query_seq
        else:
            self._query_seq = None

        # Fused encode + dense coarse level: a single dispatch computes the
        # feature pyramids AND the full (res0+1)^3 coarse lattice for every
        # object in the batch (indices are a device-side arange — only the
        # images cross the wire).
        n0 = int(resolution0)
        c = int(chunk_size)
        k0 = -(-((n0 + 1) ** 3) // c)
        idx0 = jnp.arange(k0 * c, dtype=jnp.int32).reshape(k0, c)
        use_seq = (mesh is None) and not is_disn
        self._use_seq = use_seq

        @jax.jit
        def encode_dense(variables, imgs, *extras):
            encoded = encode_fn.__wrapped__(variables, imgs)
            enc_q = encoded if is_disn else (
                encoded[0] if is_slicenet else encoded)
            b = imgs.shape[0]

            if use_seq:
                idx_t = jnp.tile(idx0, (b, 1))  # (b*k0, c)
                oids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k0)

                def body(carry, xs):
                    idx, oid = xs
                    return carry, query_row_seq(variables, enc_q, idx, oid,
                                                jnp.int32(n0), extras)

                _, vals = jax.lax.scan(body, 0, (idx_t, oids))  # (b*k0, c)
                return encoded, vals.reshape(b, -1)

            def body(carry, idx):
                idx_b = jnp.broadcast_to(idx[None], (b, idx.shape[0]))
                if shard_points:
                    # latency mode: split this chunk's point axis across
                    # the mesh (the lattice indices are device-generated,
                    # so the constraint is what shards the compute)
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    idx_b = jax.lax.with_sharding_constraint(
                        idx_b, NamedSharding(mesh, P(None, "data")))
                return carry, query_row(variables, enc_q, idx_b,
                                        jnp.int32(n0), extras)

            _, vals = jax.lax.scan(body, 0, idx0)  # (k0, B, c)
            return encoded, jnp.transpose(vals, (1, 0, 2)).reshape(b, -1)

        # -- dense coarse level over tensor-grid slabs (separable sampling)
        # The rotation-free reference projection makes every fixed-z slab
        # of the query lattice a tensor grid in uv (ops/lattice_sample.py),
        # so the coarse level samples with two small matmuls per pyramid
        # level per slab instead of 4 C-wide row gathers per point.  Used
        # when the feed's trans matrices pass projection_is_separable
        # (host-checked per batch); the gather path remains the fallback
        # and serves the sparse refinement levels.
        if use_seq:
            from .ops import project_points
            from .ops.lattice_sample import lattice_sample_sum

            nn0 = n0 + 1
            axis_vals = ((jnp.arange(nn0, dtype=jnp.float32) / n0 - 0.5)
                         * box_size)
            flip = jnp.array([1.0, -1.0, -1.0], jnp.float32)
            n_sl = int(model.n_slices)
            # slabs per scan step: sized so each head dispatch sees ~32k
            # points (the chunk the fused encoder kernel was tuned at) —
            # 129 single-slab steps measured ~0.25 us/pt of step glue the
            # grouped layout removes
            import os as _os

            slab_pts = float(_os.environ.get("SLICE3D_SLAB_PTS", "32768"))
            grp = min(nn0, max(1, int(round(slab_pts / (nn0 * nn0)))))
            n_groups = -(-nn0 // grp)

            def slab_vals(variables, packed, oid, z0, trans_tp):
                # G consecutive z-slabs of one object per step (z indices
                # past the lattice clamp and are sliced off by the caller)
                zis = jnp.clip(z0 + jnp.arange(grp, dtype=jnp.int32),
                               0, nn0 - 1)
                zv = axis_vals[zis]  # (G,)
                zeros = jnp.zeros((grp, nn0), jnp.float32)
                ax = jnp.broadcast_to(axis_vals[None], (grp, nn0))
                zcol = jnp.broadcast_to(zv[:, None], (grp, nn0))
                # probe rows: u depends only on (x, z), v only on (y, z)
                px_pts = jnp.stack([ax, zeros, zcol], axis=-1)  # (G,nn0,3)
                py_pts = jnp.stack([zeros, ax, zcol], axis=-1)
                t = jax.lax.dynamic_index_in_dim(trans_tp, oid, 0,
                                                 keepdims=True)  # (1,4,3)
                u = project_points(
                    (px_pts * flip).reshape(1, -1, 3), t
                )[..., 0].reshape(grp, nn0)
                v = project_points(
                    (py_pts * flip).reshape(1, -1, 3), t
                )[..., 1].reshape(grp, nn0)
                sampled = lattice_sample_sum(packed, u, v, n_sl,
                                             obj_index=oid)  # shared-plane
                s_flat = sampled.reshape(1, grp * nn0 * nn0, n_sl, -1)
                # slab points in the same (slab, y-major, x-minor) order
                xg = jnp.broadcast_to(axis_vals[None, None, :],
                                      (grp, nn0, nn0))
                yg = jnp.broadcast_to(axis_vals[None, :, None],
                                      (grp, nn0, nn0))
                zg = jnp.broadcast_to(zv[:, None, None], (grp, nn0, nn0))
                qry = (jnp.stack([xg, yg, zg], axis=-1)
                       .reshape(1, -1, 3) * flip)
                sdf = model.apply(variables, qry, s_flat,
                                  method=model.query_presampled)
                return (-sdf)[0].astype(wire_dtype)  # (G*nn0^2,)

            @jax.jit
            def encode_dense_lattice(variables, imgs, *extras):
                encoded = encode_fn.__wrapped__(variables, imgs)
                enc_q = encoded[0] if is_slicenet else encoded
                b = imgs.shape[0]
                trans_tp = extras[0]
                oids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_groups)
                z0s = jnp.tile(
                    jnp.arange(n_groups, dtype=jnp.int32) * grp, (b,))

                def body(carry, xs):
                    oid, z0 = xs
                    return carry, slab_vals(variables, enc_q, oid, z0,
                                            trans_tp)

                _, vals = jax.lax.scan(body, 0, (oids, z0s))
                # (b*n_groups, G*nn0^2) in (z)(y, x) order; drop clamped
                # duplicate slabs, then flatten to the lattice_pts
                # convention idx = x*nn0^2 + y*nn0 + z
                vals = vals.reshape(b, n_groups * grp, nn0, nn0)[:, :nn0]
                vals = jnp.transpose(vals, (0, 3, 2, 1)).reshape(b, -1)
                pad = k0 * c - nn0 ** 3
                if pad:
                    vals = jnp.pad(vals, ((0, 0), (0, pad)))
                return encoded, vals

            self._encode_dense_lattice = encode_dense_lattice
        else:
            self._encode_dense_lattice = None

        self._encode = encode_fn
        self._encode_dense = encode_dense
        self._query_many = query_many
        self._query_pts_diff = query_pts_diff  # differentiable, for refine
        self._is_slicenet = is_slicenet
        self._is_disn = is_disn

        # -- fused-levels program (single object, single device; OPT-IN) --
        # The level-l active mask depends only on level-(l-1) values, which
        # already live on device — so the WHOLE coarse-to-fine refinement
        # (encode + dense coarse + every masked level) can run as ONE
        # device dispatch.  Active fine-lattice points are selected on
        # device with jnp.nonzero at a fixed cap (static shape for XLA);
        # the host learns per-level counts from the first (classic) run and
        # buckets caps on the 1/1.5-pow2 grid, falling back to the classic
        # per-level path on cap overflow.  Default OFF — measured on v5e
        # at the full-quality point (res0 64, up 2): steady-state eval
        # 0.88 s fused vs 0.68 s classic — the on-device selection
        # (nonzero/scatter/upsample over the 17M-point fine lattice, plus
        # cap-slack evaluation) costs ~3x the two ~33-66 ms round trips it
        # removes, and each cap bucket is a fresh ~30 s XLA compile that
        # varying objects re-trigger.  Kept opt-in: the correctness
        # machinery (bit-exact mask twins, overflow fallback) is tested,
        # and on hardware with a slower host link the trade can invert.
        up_steps = int(upsampling_steps)
        logit_thr = float(np.log(threshold) - np.log(1.0 - threshold))
        self._fuse_ok = bool(fuse_levels) and use_seq and up_steps > 0
        self._cap_seen = [0] * up_steps
        self._fused_cache: Dict[Tuple[int, ...], object] = {}

        if self._fuse_ok:
            from .mesh.extract import (active_cells_jnp,
                                       touched_lattice_mask_jnp,
                                       upsample2x_jnp)

            dilate = self.generator.dilate
            n_l0 = (n0 + 1) ** 3

            def make_fused(caps_k: Tuple[int, ...]):
                @jax.jit
                def fused(variables, imgs, *extras):
                    encoded = encode_fn.__wrapped__(variables, imgs)
                    enc_q = encoded if is_disn else (
                        encoded[0] if is_slicenet else encoded)
                    oid0 = jnp.int32(0)

                    def body0(carry, idx):
                        return carry, query_row_seq(
                            variables, enc_q, idx, oid0, n0, extras)

                    _, dvals = jax.lax.scan(body0, 0, idx0)  # (k0, c) wire
                    grid = (dvals.reshape(-1)[:n_l0]
                            .astype(jnp.float32).reshape((n0 + 1,) * 3))
                    outs = []
                    res = n0
                    for kcap in caps_k:
                        cap = kcap * c
                        active = active_cells_jnp(grid, logit_thr, dilate)
                        mask = touched_lattice_mask_jnp(active)
                        fine = upsample2x_jnp(grid)
                        res2 = 2 * res
                        n_fine = (res2 + 1) ** 3
                        idx = jnp.nonzero(
                            mask.reshape(-1), size=cap,
                            fill_value=n_fine)[0].astype(jnp.int32)
                        n_act = jnp.sum(mask.astype(jnp.int32))

                        def body(carry, ix):
                            return carry, query_row_seq(
                                variables, enc_q, ix, oid0, res2, extras)

                        _, vals = jax.lax.scan(body, 0, idx.reshape(kcap, c))
                        vflat = vals.reshape(-1)
                        # fill-slot indices (== n_fine) land out of bounds
                        # and are dropped by the scatter
                        fine = (fine.reshape(-1)
                                .at[idx].set(vflat.astype(jnp.float32),
                                             mode="drop")
                                .reshape(fine.shape))
                        grid = fine
                        outs.append((idx, vflat, n_act))
                        res = res2
                    return encoded, dvals.reshape(1, -1), outs

                return fused

            self._make_fused = make_fused

    def _pad_chunks(self, idx_b: np.ndarray) -> np.ndarray:
        """(B, m) flat lattice indices -> (k, B, c) chunk grid.

        k is rounded up to a power of 2 OR 1.5x a power of 2 (1, 2, 3, 4,
        6, 8, 12, ...): still a bounded set of compiled specializations,
        but worst-case slot waste drops from ~100% to ~33% — at 256^3 the
        refined level's real point count routinely lands just past a power
        of 2.
        """
        b, m = idx_b.shape
        c = self.chunk_size
        k_pad = self._pad_k(max(-(-m // c), 1))
        padded = np.zeros((b, k_pad * c), np.int32)
        padded[:, :m] = idx_b
        return np.ascontiguousarray(
            padded.reshape(b, k_pad, c).transpose(1, 0, 2))

    @staticmethod
    def _pad_k(k: int) -> int:
        """Round a chunk count up to the 1/1.5 x power-of-2 grid (1, 2, 3,
        4, 6, 8, 12, ...): bounded compile specializations, <=33% waste."""
        k_pad = 1
        while k_pad < k:
            if k <= k_pad + k_pad // 2:
                return k_pad + k_pad // 2
            k_pad *= 2
        return k_pad

    def _pad_chunks_seq(self, idxs: Sequence[np.ndarray]):
        """Per-object index lists -> sequential chunk layout.

        Returns (idx2d (k, c), oids (k,), spans) where spans[i] = (flat
        value offset, length) of object i in the scan output, or ``None``
        if every list is empty.  Each object is padded only to its own
        chunk multiple — no cross-object m_max padding (the (k, B, c)
        layout pads every object to the largest object's count).
        """
        c = self.chunk_size
        ks = [-(-len(ix) // c) for ix in idxs]
        k_tot = sum(ks)
        if k_tot == 0:
            return None
        k_pad = self._pad_k(k_tot)
        idx2d = np.zeros((k_pad, c), np.int32)
        oids = np.zeros((k_pad,), np.int32)
        spans = []
        row = 0
        for i, ix in enumerate(idxs):
            if ks[i] == 0:
                spans.append((0, 0))
                continue
            flat = np.zeros(ks[i] * c, np.int32)
            flat[:len(ix)] = ix
            idx2d[row:row + ks[i]] = flat.reshape(ks[i], c)
            oids[row:row + ks[i]] = i
            spans.append((row * c, len(ix)))
            row += ks[i]
        return idx2d, oids, spans

    # -- encoding ---------------------------------------------------------

    def encode_slices(self, img_slices: np.ndarray):
        """img_slices: (S, H, W, 3) -> device pyramids (GTSlice path)."""
        return self._encode(self.variables, jnp.asarray(img_slices)[None])

    def encode_input_view(self, img_input: np.ndarray):
        """img_input: (H, W, 3) -> (pyramids, predicted slices) (SliceNet)."""
        return self._encode(self.variables, jnp.asarray(img_input)[None])

    # -- full object reconstruction ---------------------------------------

    def _stack_inputs(self, feeds: Sequence[Dict[str, np.ndarray]]):
        """Stack B feed dicts into batched (imgs, extras) device arrays."""
        if self._is_disn:
            imgs = np.stack([f["img_input"] for f in feeds])
            extras = (np.stack([f["trans_mat_right"] for f in feeds]),
                      np.stack([f["obj_rot_mat"] for f in feeds]))
        else:
            extras = (np.stack([f["trans_mat_wo_rot_tp"] for f in feeds]),)
            if self._is_slicenet:
                imgs = np.stack([f["img_input"] for f in feeds])
            else:
                imgs = np.stack([f["img_slices"] for f in feeds])
        if self.mesh is not None:
            imgs = jax.device_put(imgs, self._sh_batch)
            extras = tuple(jax.device_put(e, self._sh_batch) for e in extras)
        else:
            imgs = jnp.asarray(imgs)
            extras = tuple(jnp.asarray(e) for e in extras)
        return imgs, extras

    # -- fused-levels helpers ---------------------------------------------

    def _note_level(self, res: int, n: int) -> None:
        """Record a refinement level's real point count (cap learning)."""
        l = (res // self.generator.resolution0).bit_length() - 2
        if 0 <= l < len(self._cap_seen) and n > self._cap_seen[l]:
            self._cap_seen[l] = n

    def _caps_k(self) -> Optional[Tuple[int, ...]]:
        """Per-level device caps in chunk units (1.3x headroom over the
        largest count seen, bucketed), or None until a classic run has
        recorded every level."""
        if not self._fuse_ok or any(s == 0 for s in self._cap_seen):
            return None
        c = self.chunk_size
        return tuple(self._pad_k(-(-int(1.3 * s) // c))
                     for s in self._cap_seen)

    def _fused_fn(self, caps_k: Tuple[int, ...]):
        fn = self._fused_cache.get(caps_k)
        if fn is None:
            fn = self._fused_cache[caps_k] = self._make_fused(caps_k)
        return fn

    def _conditioned_fns(self, feeds: Sequence[Dict[str, np.ndarray]]):
        """Dispatch the batch's device work; returns an opaque cond dict.

        Classic kind: the fused encode+coarse dispatch has run (async) and
        ``evaluator(idxs, res)`` covers each masked refinement level of ALL
        B objects in one dispatch (per-object flat index lists in, value
        arrays out).  Fused kind (single object): encode + dense coarse +
        EVERY masked level already ran as one dispatch — the cond carries
        the device outputs for host replay, plus the classic evaluator for
        cap-overflow fallback.  ``logit_fn_for(b)`` is the per-object
        differentiable query used by refine_mesh.
        """
        imgs, extras = self._stack_inputs(feeds)
        caps_k = self._caps_k() if len(feeds) == 1 else None
        if caps_k is not None:
            encoded, dense_vals, levels = self._fused_fn(caps_k)(
                self.variables, imgs, *extras)
        else:
            dense_fn = self._encode_dense
            if self._encode_dense_lattice is not None:
                import os

                from .ops.lattice_sample import projection_is_separable

                # (quad mode stores 4C-packed big levels the separable
                # sampler does not address — study mode, gather only)
                if (os.environ.get("SLICE3D_LATTICE_DENSE", "1") != "0"
                        and os.environ.get("SLICE3D_GATHER", "rows") != "quad"
                        and all(projection_is_separable(
                            f["trans_mat_wo_rot_tp"]) for f in feeds)):
                    dense_fn = self._encode_dense_lattice
            encoded, dense_vals = dense_fn(self.variables, imgs, *extras)
            levels = None
        enc_q = encoded if self._is_disn else (
            encoded[0] if self._is_slicenet else encoded)

        if self._use_seq:

            def evaluator(idxs: Sequence[np.ndarray], res: int):
                self._note_level(res, max((len(ix) for ix in idxs), default=0))
                packed = self._pad_chunks_seq(idxs)
                if packed is None:
                    return [np.zeros((0,), np.float32) for _ in idxs]
                idx2d, oids, spans = packed
                vals = np.asarray(self._query_seq(
                    self.variables, enc_q, jnp.asarray(idx2d),
                    jnp.asarray(oids), jnp.int32(res), *extras,
                ), np.float32)
                return [vals[off:off + ln] for off, ln in spans]

        else:

            def evaluator(idxs: Sequence[np.ndarray], res: int):
                self._note_level(res, max((len(ix) for ix in idxs), default=0))
                m_max = max((len(ix) for ix in idxs), default=0)
                if m_max == 0:
                    return [np.zeros((0,), np.float32) for _ in idxs]
                idx_b = np.zeros((len(idxs), m_max), np.int32)
                for i, ix in enumerate(idxs):
                    idx_b[i, :len(ix)] = ix
                chunks = self._pad_chunks(idx_b)
                if self.mesh is not None:
                    chunks = jax.device_put(chunks, self._sh_chunks)
                vals = np.asarray(self._query_many(
                    self.variables, enc_q, jnp.asarray(chunks),
                    jnp.int32(res), *extras,
                ), np.float32)
                return [vals[i, :len(ix)] for i, ix in enumerate(idxs)]

        def logit_fn_for(b: int):
            enc_b = jax.tree_util.tree_map(lambda x: x[b:b + 1], enc_q)
            extras_b = tuple(e[b:b + 1] for e in extras)

            def logit_fn(pts):
                return self._query_pts_diff(
                    self.variables, enc_b, pts[None], *extras_b)[0]

            return logit_fn

        return {"kind": "fused" if levels is not None else "classic",
                "evaluator": evaluator, "dense_vals": dense_vals,
                "levels": levels, "caps_k": caps_k,
                "logit_fn_for": logit_fn_for}

    def _maybe_refine(self, mesh: Mesh, logit_fn_thunk, stats: Dict) -> Mesh:
        """Optional refine_mesh polish (reference reconstruct.py:271-332).

        ``logit_fn_thunk`` is only invoked when refinement runs — building
        the per-object logit closure slices device arrays (a dozen small
        dispatches), which would otherwise tax every non-refined object on
        a tunneled chip.
        """
        if not self.refine_steps or mesh.is_empty:
            return mesh
        import time

        from .mesh.refine import refine_mesh

        t0 = time.perf_counter()
        verts, _ = refine_mesh(
            mesh.vertices, mesh.faces, logit_fn_thunk(),
            steps=self.refine_steps, threshold=self.generator.threshold,
        )
        stats["time_refine"] = time.perf_counter() - t0
        return Mesh(vertices=verts, faces=mesh.faces)

    def _march_one(self, grid: np.ndarray, stats: Dict) -> Mesh:
        import time

        from .mesh.extract import extract_mesh_from_grid

        logit_thr = float(np.log(self.generator.threshold)
                          - np.log(1.0 - self.generator.threshold))
        t0 = time.perf_counter()
        mesh = extract_mesh_from_grid(grid, logit_thr, self.generator.box_size,
                                      method=self.generator.method)
        if self.simplify_nfaces and not mesh.is_empty:
            from .mesh import simplify_mesh

            mesh = simplify_mesh(mesh, self.simplify_nfaces)
        stats["time_marching"] = time.perf_counter() - t0
        return mesh

    def warm(self, feeds: Sequence[Dict[str, np.ndarray]],
             k_buckets: Sequence[int] = (1, 2, 3, 4, 6, 8, 12, 16)):
        """Pre-compile the per-level query specializations a serving
        workload can hit.

        The per-level dispatch re-specializes on the padded chunk count k
        (the 1/1.5-pow2 grid of :meth:`_pad_k`); real objects hit k values
        a single warmup reconstruction never visits, and each miss is a
        fresh multi-second XLA compile in the middle of a served request
        (measured on the tunneled v5e: a 4-object microbatch group at
        256^3-effective stalled ~20 s on its first unseen bucket, turning
        the micro-batching speedup into a 0.44x slowdown).  ``res`` is a
        traced scalar, so ONE compile per k covers every refinement level.
        Each bucket's dummy evaluation also runs (device time is trivial
        next to the compile), leaving both the in-process executable cache
        and the persistent on-disk cache hot.

        feeds: exactly ``batch_size`` feed dicts (shape donors only — the
        values are irrelevant).  Returns the sorted list of padded k
        values compiled.
        """
        feeds = list(feeds)[: self.batch_size]
        saved_caps = list(self._cap_seen)  # keep fused-cap learning honest
        try:
            cond = self._conditioned_fns(feeds)
            ev = cond["evaluator"]
            res = int(self.generator.resolution0) * 2
            c = self.chunk_size
            seen = set()
            for k in k_buckets:
                kp = self._pad_k(int(k))
                if kp in seen:
                    continue
                seen.add(kp)
                idxs = [np.zeros(kp * c, np.int32)]
                idxs += [np.zeros(0, np.int32)] * (len(feeds) - 1)
                ev(idxs, res)
        finally:
            self._cap_seen = saved_caps
        return sorted(seen)

    def reconstruct(self, feed: Dict[str, np.ndarray]) -> Tuple[Mesh, Dict]:
        """feed: one dataset sample (unbatched numpy dict)."""
        from functools import partial

        grids, logit_fn_for, stats_list = self._build_grids([feed])
        stats = stats_list[0]
        mesh = self._march_one(grids[0], stats)
        return self._maybe_refine(mesh, partial(logit_fn_for, 0), stats), stats

    def reconstruct_batch(
        self, feeds: Sequence[Dict[str, np.ndarray]]
    ) -> List[Tuple[Mesh, Dict]]:
        """Reconstruct up to ``batch_size`` objects in batched dispatches."""
        from functools import partial

        grids, logit_fn_for, stats_list = self._build_grids(list(feeds))
        out = []
        for b, (grid, stats) in enumerate(zip(grids, stats_list)):
            mesh = self._march_one(grid, stats)
            out.append((self._maybe_refine(mesh, partial(logit_fn_for, b),
                                           stats), stats))
        return out

    def reconstruct_all(self, feeds, on_result) -> None:
        """Pipelined reconstruction over many objects.

        Objects are grouped into device batches of ``batch_size``; the
        native isosurface/simplify stage of batch i runs on host worker
        threads while the device already evaluates batch i+1's SDF grids —
        the host/device overlap the reference's per-object loop lacks.
        ``on_result(index, mesh, stats)`` is called in order.
        """
        from concurrent.futures import ThreadPoolExecutor

        b = self.batch_size
        # marching releases the GIL inside the native kernels, so a few
        # workers genuinely parallelize the host stage for a batch
        n_workers = max(min(b, 8), 1)

        def batches():
            buf = []
            for feed in feeds:
                buf.append(feed)
                if len(buf) == b:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def padded(group):
            if len(group) < b:
                # pad the tail batch (compiled shapes stay fixed)
                return group + [group[-1]] * (b - len(group))
            return group

        with ThreadPoolExecutor(n_workers) as pool:
            pending = None  # (base_idx, n_real, futures, logit_fn_for, stats)

            def finish(base, n_real, futs, logit_fn_for, stats_list):
                from functools import partial

                for j in range(n_real):
                    mesh = futs[j].result()
                    # refinement dispatches device programs: keep it on the
                    # main thread (single compile stream) — marching stays
                    # overlapped
                    mesh = self._maybe_refine(mesh, partial(logit_fn_for, j),
                                              stats_list[j])
                    on_result(base + j, mesh, stats_list[j])

            base_idx = 0
            it = batches()
            cur = next(it, None)
            # encode dispatch is async: enqueue the NEXT batch's encode
            # before syncing the current batch's levels so the device
            # stays busy through the host-side mask/marching stages
            cur_cond = self._conditioned_fns(padded(cur)) if cur else None
            while cur is not None:
                nxt = next(it, None)
                nxt_cond = (self._conditioned_fns(padded(nxt))
                            if nxt is not None else None)
                n_real = len(cur)
                grids, logit_fn_for, stats_list = self._build_grids_from(
                    cur_cond, n_feeds=b)
                futs = [pool.submit(self._march_one, grids[j], stats_list[j])
                        for j in range(n_real)]
                if pending is not None:
                    finish(*pending)
                pending = (base_idx, n_real, futs, logit_fn_for, stats_list)
                base_idx += n_real
                cur, cur_cond = nxt, nxt_cond
            if pending is not None:
                finish(*pending)

    def _build_grids(self, feeds: Sequence[Dict[str, np.ndarray]]):
        """Device portion: encode + refined value grids (list of numpy).

        Returns (grids, logit_fn_for, stats_list).
        """
        return self._build_grids_from(self._conditioned_fns(feeds),
                                      n_feeds=len(feeds))

    def _build_grids_from(self, cond, *, n_feeds: int):
        """Grid build from already-dispatched conditioning (see
        ``_conditioned_fns``); lets callers prefetch the next batch's
        encode before this batch's levels sync."""
        import time

        from .mesh.extract import GridRefiner

        g = self.generator
        logit_thr = float(np.log(g.threshold) - np.log(1.0 - g.threshold))
        stats_list = [dict() for _ in range(n_feeds)]
        t0 = time.perf_counter()
        if cond["kind"] == "fused":
            grids = [self._replay_fused(cond, logit_thr, stats_list[0])]
        else:
            refiner = GridRefiner(
                resolution0=g.resolution0,
                upsampling_steps=g.upsampling_steps,
                threshold=logit_thr, box_size=g.box_size,
                chunk_size=g.chunk_size, dilate=g.dilate,
            )
            grids = refiner.build_batch(cond["evaluator"],
                                        cond["dense_vals"], stats_list)
        dt = time.perf_counter() - t0
        for st in stats_list:
            st["time_eval_points"] = dt
        return grids, cond["logit_fn_for"], stats_list

    def _replay_fused(self, cond, logit_thr: float, stats: Dict) -> np.ndarray:
        """Host replay of the fused-levels device outputs -> dense grid.

        Per level: native trilinear upsample, then scatter the device
        values at the host-recomputed (identical — the jnp mask twins are
        bit-exact, tests/test_extract.py) ascending active indices.  If the
        device cap overflowed (or the index sets ever diverged), the level
        is re-evaluated through the classic per-level evaluator — correct,
        just one extra dispatch — and the learned cap grows for next time.
        """
        from .mesh import refine_level

        g = self.generator
        n0 = g.resolution0
        n_l0 = (n0 + 1) ** 3
        grid = np.ascontiguousarray(
            np.asarray(cond["dense_vals"], np.float32)[0, :n_l0]
            .reshape((n0 + 1,) * 3))
        n_eval = n_l0
        res = n0
        stale = False  # once a level falls back, later device levels were
        # computed from a diverged device grid and must also go classic
        for l, (idx_d, vals_d, n_d) in enumerate(cond["levels"]):
            n = int(n_d)
            self._note_level(2 * res, n)
            cap = cond["caps_k"][l] * self.chunk_size
            fine, idx_host = refine_level(grid, logit_thr, g.dilate)
            res *= 2
            ok = not stale and n <= cap and len(idx_host) == n
            if ok and n:
                ix = np.asarray(idx_d[:n])
                ok = np.array_equal(ix, idx_host)
                if ok:
                    fine.reshape(-1)[ix] = np.asarray(vals_d, np.float32)[:n]
            if not ok:
                # cap overflow (device evaluated only a prefix of the mask)
                # or index divergence: classic re-eval of the full host list
                stale = True
                if len(idx_host):
                    vals = cond["evaluator"]([idx_host], res)[0]
                    fine.reshape(-1)[idx_host] = np.asarray(
                        vals[:len(idx_host)], np.float32)
                n = len(idx_host)
                self._note_level(res, n)
            grid = fine
            n_eval += n
        stats["n_points_evaluated"] = n_eval
        stats["final_resolution"] = res
        return grid

    # Back-compat single-object helper used by tests/benches.
    def _build_grid(self, feed):
        grids, logit_fn_for, stats_list = self._build_grids([feed])
        return grids[0], logit_fn_for(0), stats_list[0]

    def predicted_slices(self, img_input: np.ndarray) -> np.ndarray:
        """SliceNet only: (S, H, W, 3) predicted slice images in [-1, 1]."""
        if not self._is_slicenet:
            raise ValueError("predicted_slices requires a SliceNet model")
        _, slices = self.encode_input_view(img_input)
        return np.asarray(slices)
