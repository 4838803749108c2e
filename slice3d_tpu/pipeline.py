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
        chunk_size: int = 65536,
        box_size: float = 1.0,
        simplify_nfaces: int = 0,
        refine_steps: int = 0,
    ):
        self.model = model
        self.variables = variables
        self.simplify_nfaces = simplify_nfaces
        self.refine_steps = refine_steps
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

            def query_xyz(variables, encoded, pts, trans_right, obj_rot):
                pyramids, feat_global = encoded
                qry_norot = pts[None]
                qry_rot = jnp.einsum("bmi,bij->bmj", qry_norot, obj_rot)
                sdf = model_diff.apply(
                    variables, pyramids, feat_global, qry_rot, qry_norot,
                    trans_right, method=model_diff.query,
                )
                return -sdf[0]

            @jax.jit
            def query_fn(variables, encoded, idx, res, trans_right, obj_rot):
                return query_xyz(variables, encoded, lattice_pts(idx, res),
                                 trans_right, obj_rot)

        else:

            def query_xyz(variables, pyramids, pts, trans_tp):
                # test-mode canonical->camera mapping: flip y/z (models.py:53-56)
                qry = pts[None] * jnp.array([1.0, -1.0, -1.0], dtype=pts.dtype)
                sdf = model_diff.apply(
                    variables, pyramids, qry, trans_tp,
                    method=model_diff.query_folded,
                )
                return -sdf[0]  # logit convention: inside positive

            @jax.jit
            def query_fn(variables, pyramids, idx, res, trans_tp):
                return query_xyz(variables, pyramids, lattice_pts(idx, res),
                                 trans_tp)

        self._encode = encode_fn
        self._query = query_fn
        self._query_xyz = query_xyz  # differentiable, for refine_mesh
        self._is_slicenet = is_slicenet
        self._is_disn = is_disn

    # -- encoding ---------------------------------------------------------

    def encode_slices(self, img_slices: np.ndarray):
        """img_slices: (S, H, W, 3) -> device pyramids (GTSlice path)."""
        return self._encode(self.variables, jnp.asarray(img_slices)[None])

    def encode_input_view(self, img_input: np.ndarray):
        """img_input: (H, W, 3) -> (pyramids, predicted slices) (SliceNet)."""
        return self._encode(self.variables, jnp.asarray(img_input)[None])

    # -- full object reconstruction ---------------------------------------

    def _conditioned_fns(self, feed: Dict[str, np.ndarray]):
        """Per-object closures: (lattice-chunk evaluator, xyz logit fn)."""
        if self._is_disn:
            encoded = self._encode(self.variables, jnp.asarray(feed["img_input"])[None])
            trans_right = jnp.asarray(feed["trans_mat_right"])[None]
            obj_rot = jnp.asarray(feed["obj_rot_mat"])[None]

            def evaluator(idx: np.ndarray, res: int):
                return self._query(
                    self.variables, encoded, jnp.asarray(idx), jnp.int32(res),
                    trans_right, obj_rot,
                )

            def logit_fn(pts):
                return self._query_xyz(self.variables, encoded, pts,
                                       trans_right, obj_rot)

        else:
            trans_tp = jnp.asarray(feed["trans_mat_wo_rot_tp"])[None]
            if self._is_slicenet:
                pyramids, _ = self.encode_input_view(feed["img_input"])
            else:
                pyramids = self.encode_slices(feed["img_slices"])

            def evaluator(idx: np.ndarray, res: int):
                # returns the device array: keeps dispatch asynchronous so
                # the grid refiner overlaps chunk uploads with device compute
                return self._query(
                    self.variables, pyramids, jnp.asarray(idx),
                    jnp.int32(res), trans_tp,
                )

            def logit_fn(pts):
                return self._query_xyz(self.variables, pyramids, pts, trans_tp)

        return evaluator, logit_fn

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
        evaluator, logit_fn = self._conditioned_fns(feed)
        mesh, stats = self.generator.generate(evaluator)
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

        evaluator, logit_fn = self._conditioned_fns(feed)
        g = self.generator
        logit_thr = float(np.log(g.threshold) - np.log(1.0 - g.threshold))
        refiner = GridRefiner(
            resolution0=g.resolution0, upsampling_steps=g.upsampling_steps,
            threshold=logit_thr, box_size=g.box_size, chunk_size=g.chunk_size,
            dilate=g.dilate,
        )
        stats = {}
        t0 = time.perf_counter()
        grid = refiner.build(evaluator, stats)
        stats["time_eval_points"] = time.perf_counter() - t0
        return grid, logit_fn, stats

    def predicted_slices(self, img_input: np.ndarray) -> np.ndarray:
        """SliceNet only: (S, H, W, 3) predicted slice images in [-1, 1]."""
        if not self._is_slicenet:
            raise ValueError("predicted_slices requires a SliceNet model")
        _, slices = self.encode_input_view(img_input)
        return np.asarray(slices)
