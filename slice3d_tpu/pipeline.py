"""Device/host reconstruction pipeline: image(s) -> SDF grid -> mesh.

Ties a slice model (SliceNet / GTSlice / DISN), the coarse-to-fine grid
refiner, and the native isosurfacer together.  The feature pyramids are
encoded ONCE per object and kept on device; the per-chunk SDF query is a
single jit-compiled program of fixed shape (compiled once, reused across
all refinement rounds and objects).
"""

from __future__ import annotations

from typing import Dict, Tuple

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
    ):
        self.model = model
        self.variables = variables
        self.simplify_nfaces = simplify_nfaces
        self.refine_steps = refine_steps
        self.chunk_size = chunk_size
        self.generator = MeshGenerator(
            resolution0=resolution0,
            upsampling_steps=upsampling_steps,
            threshold=threshold,
            chunk_size=chunk_size,
            box_size=box_size,
        )

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

        if is_disn:

            def make_query_xyz(m):
                def query_xyz(variables, encoded, pts, trans_right, obj_rot):
                    pyramids, feat_global = encoded
                    qry_norot = pts[None]
                    qry_rot = jnp.einsum("bmi,bij->bmj", qry_norot, obj_rot)
                    sdf = m.apply(
                        variables, pyramids, feat_global, qry_rot, qry_norot,
                        trans_right, method=m.query,
                    )
                    return -sdf[0]

                return query_xyz

        else:

            def make_query_xyz(m):
                def query_xyz(variables, pyramids, pts, trans_tp):
                    # test-mode canonical->camera mapping: flip y/z
                    # (models.py:53-56)
                    qry = pts[None] * jnp.array([1.0, -1.0, -1.0],
                                                dtype=pts.dtype)
                    sdf = m.apply(
                        variables, pyramids, qry, trans_tp,
                        method=m.query_folded,
                    )
                    return -sdf[0]  # logit convention: inside positive

                return query_xyz

        query_xyz_fast = make_query_xyz(model)       # fused hot path
        query_xyz = make_query_xyz(model_diff)       # autodiff-safe (refine)

        def query_row(variables, encoded, idx, res, extras):
            # one fixed-size chunk of flat lattice indices -> values
            return query_xyz_fast(variables, encoded, lattice_pts(idx, res),
                                  *extras)

        # One device dispatch per refinement level: lax.scan over (k, c)
        # index chunks.  On a tunneled chip each dispatch is ~100 ms of RPC
        # overhead vs ~14 ms of compute per 64k chunk, so per-chunk host
        # calls sit 8x off the wire-limited optimum.  jit re-specializes per
        # distinct k (rounded to powers of two to bound compile count).
        @jax.jit
        def query_many(variables, encoded, idx2d, res, *extras):
            def body(carry, idx):
                return carry, query_row(variables, encoded, idx, res, extras)

            _, vals = jax.lax.scan(body, 0, idx2d)
            return vals.reshape(-1)

        # Fused encode + dense coarse level: a single dispatch computes the
        # feature pyramids AND the full (res0+1)^3 coarse lattice (indices
        # are a device-side arange — only the image crosses the wire).
        n0 = int(resolution0)
        c = int(chunk_size)
        k0 = -(-((n0 + 1) ** 3) // c)
        idx0 = jnp.arange(k0 * c, dtype=jnp.int32).reshape(k0, c)

        @jax.jit
        def encode_dense(variables, imgs, *extras):
            encoded = encode_fn.__wrapped__(variables, imgs)
            enc_q = encoded if is_disn else (
                encoded[0] if is_slicenet else encoded)

            def body(carry, idx):
                return carry, query_row(variables, enc_q, idx, jnp.int32(n0),
                                        extras)

            _, vals = jax.lax.scan(body, 0, idx0)
            return encoded, vals.reshape(-1)

        self._encode = encode_fn
        self._encode_dense = encode_dense
        self._query_many = query_many
        self._query_xyz = query_xyz  # differentiable, for refine_mesh
        self._is_slicenet = is_slicenet
        self._is_disn = is_disn

    def _pad_chunks(self, idx: np.ndarray) -> np.ndarray:
        """(m,) flat lattice indices -> (k, c) chunk rows, k a power of 2."""
        c = self.chunk_size
        k = max(-(-len(idx) // c), 1)
        k_pad = 1
        while k_pad < k:
            k_pad *= 2
        padded = np.zeros((k_pad * c,), np.int32)
        padded[:len(idx)] = idx
        return padded.reshape(k_pad, c)

    # -- encoding ---------------------------------------------------------

    def encode_slices(self, img_slices: np.ndarray):
        """img_slices: (S, H, W, 3) -> device pyramids (GTSlice path)."""
        return self._encode(self.variables, jnp.asarray(img_slices)[None])

    def encode_input_view(self, img_input: np.ndarray):
        """img_input: (H, W, 3) -> (pyramids, predicted slices) (SliceNet)."""
        return self._encode(self.variables, jnp.asarray(img_input)[None])

    # -- full object reconstruction ---------------------------------------

    def _conditioned_fns(self, feed: Dict[str, np.ndarray]):
        """Per-object closures: (level evaluator, dense coarse fn, logit fn).

        The dense fn fuses encode + full coarse lattice in ONE dispatch; the
        evaluator covers each masked refinement level in one dispatch.
        """
        if self._is_disn:
            imgs = jnp.asarray(feed["img_input"])[None]
            extras = (jnp.asarray(feed["trans_mat_right"])[None],
                      jnp.asarray(feed["obj_rot_mat"])[None])
        else:
            extras = (jnp.asarray(feed["trans_mat_wo_rot_tp"])[None],)
            if self._is_slicenet:
                imgs = jnp.asarray(feed["img_input"])[None]
            else:
                imgs = jnp.asarray(feed["img_slices"])[None]

        encoded, dense_vals = self._encode_dense(self.variables, imgs, *extras)
        enc_q = encoded if self._is_disn else (
            encoded[0] if self._is_slicenet else encoded)

        def dense_fn(res: int):
            return dense_vals  # precomputed by the fused dispatch

        def evaluator(idx: np.ndarray, res: int):
            # returns the (padded) device array: the caller slices/syncs
            return self._query_many(
                self.variables, enc_q, jnp.asarray(self._pad_chunks(idx)),
                jnp.int32(res), *extras,
            )

        def logit_fn(pts):
            return self._query_xyz(self.variables, enc_q, pts, *extras)

        return evaluator, dense_fn, logit_fn

    def _maybe_refine(self, mesh: Mesh, logit_fn, stats: Dict) -> Mesh:
        """Optional refine_mesh polish (reference reconstruct.py:271-332)."""
        if not self.refine_steps or mesh.is_empty:
            return mesh
        import time

        from .mesh.refine import refine_mesh

        t0 = time.perf_counter()
        verts, _ = refine_mesh(
            mesh.vertices, mesh.faces, logit_fn,
            steps=self.refine_steps, threshold=self.generator.threshold,
        )
        stats["time_refine"] = time.perf_counter() - t0
        return Mesh(vertices=verts, faces=mesh.faces)

    def reconstruct(self, feed: Dict[str, np.ndarray]) -> Tuple[Mesh, Dict]:
        """feed: one dataset sample (unbatched numpy dict)."""
        evaluator, dense_fn, logit_fn = self._conditioned_fns(feed)
        mesh, stats = self.generator.generate(evaluator, dense_fn=dense_fn)
        if self.simplify_nfaces and not mesh.is_empty:
            import time

            from .mesh import simplify_mesh

            t0 = time.perf_counter()
            mesh = simplify_mesh(mesh, self.simplify_nfaces)
            stats["time_simplify"] = time.perf_counter() - t0
        return self._maybe_refine(mesh, logit_fn, stats), stats

    def reconstruct_all(self, feeds, on_result) -> None:
        """Pipelined reconstruction over many objects.

        The native isosurface/simplify stage of object i runs on a host
        worker thread while the device already evaluates object i+1's SDF
        grid — the host/device overlap the reference's per-object loop
        lacks.  ``on_result(index, mesh, stats)`` is called in order.
        """
        import time
        from concurrent.futures import ThreadPoolExecutor

        logit_thr = float(
            np.log(self.generator.threshold) - np.log(1.0 - self.generator.threshold)
        )

        def march(grid, stats):
            from .mesh.extract import extract_mesh_from_grid

            t0 = time.perf_counter()
            mesh = extract_mesh_from_grid(grid, logit_thr, self.generator.box_size)
            if self.simplify_nfaces and not mesh.is_empty:
                from .mesh import simplify_mesh

                mesh = simplify_mesh(mesh, self.simplify_nfaces)
            stats["time_marching"] = time.perf_counter() - t0
            return mesh, stats

        with ThreadPoolExecutor(1) as pool:
            pending = None  # (index, future, logit_fn)

            def finish(j, fut, logit_fn):
                mesh, st = fut.result()
                # refinement dispatches device programs: keep it on the main
                # thread (single compile stream) — marching stays overlapped
                mesh = self._maybe_refine(mesh, logit_fn, st)
                on_result(j, mesh, st)

            for i, feed in enumerate(feeds):
                grid, logit_fn, stats = self._build_grid(feed)
                if pending is not None:
                    finish(*pending)
                pending = (i, pool.submit(march, grid, stats), logit_fn)
            if pending is not None:
                finish(*pending)

    def _build_grid(self, feed):
        """Device portion only: encode + refined value grid (numpy)."""
        import time

        from .mesh.extract import GridRefiner

        evaluator, dense_fn, logit_fn = self._conditioned_fns(feed)
        g = self.generator
        logit_thr = float(np.log(g.threshold) - np.log(1.0 - g.threshold))
        refiner = GridRefiner(
            resolution0=g.resolution0, upsampling_steps=g.upsampling_steps,
            threshold=logit_thr, box_size=g.box_size, chunk_size=g.chunk_size,
            dilate=g.dilate,
        )
        stats = {}
        t0 = time.perf_counter()
        grid = refiner.build(evaluator, stats, dense_fn=dense_fn)
        stats["time_eval_points"] = time.perf_counter() - t0
        return grid, logit_fn, stats

    def predicted_slices(self, img_input: np.ndarray) -> np.ndarray:
        """SliceNet only: (S, H, W, 3) predicted slice images in [-1, 1]."""
        if not self._is_slicenet:
            raise ValueError("predicted_slices requires a SliceNet model")
        _, slices = self.encode_input_view(img_input)
        return np.asarray(slices)
