#!/usr/bin/env python
"""Profiling ledger for the full-quality reconstruction path (SURVEY §5).

Runs the headline single-image->mesh pipeline at the reference's
full-quality operating point under a ``jax.profiler`` trace, then prints a
per-stage ledger: encode+dense dispatch, each masked refinement level
(points + wall), native marching — plus the dense-eval MFU estimate from
XLA's own FLOP count.  The trace lands in ``profiles/<ts>/`` for
TensorBoard/xprof.

Usage:  python tools/profile_reconstruct.py [--res0 64] [--up 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res0", type=int, default=64)
    ap.add_argument("--up", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--out", type=str, default="profiles")
    ap.add_argument("--trace", action="store_true", default=True)
    ap.add_argument("--no-trace", dest="trace", action="store_false")
    args = ap.parse_args()

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from slice3d_tpu import camera
    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables
    from slice3d_tpu.pipeline import Reconstructor

    opts = Options(name_model="slicenet", img_size=128, dtype="bfloat16",
                   random_init=True)
    model = build_model(opts)
    variables = init_variables(model, opts)
    # fuse_levels off: this tool times each refinement level's dispatch
    # separately, which requires the classic per-level path
    recon = Reconstructor(model, variables, resolution0=args.res0,
                          upsampling_steps=args.up, threshold=0.5,
                          chunk_size=args.chunk, fuse_levels=False)

    from bench import _frozen_images

    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)
    feed = {"img_input": _frozen_images(1)[0],
            "trans_mat_wo_rot_tp": proj.astype(np.float32)}

    # warm everything (compiles)
    recon.reconstruct(feed)

    # -- instrumented run: wrap the evaluator to time each level ----------
    cond = recon._conditioned_fns([feed])
    evaluator, dense_vals = cond["evaluator"], cond["dense_vals"]
    level_ledger = []

    def timed_evaluator(idxs, res):
        t0 = time.perf_counter()
        out = evaluator(idxs, res)
        [np.asarray(v) for v in out]  # sync
        level_ledger.append({"res": int(res),
                             "n_idx": int(sum(len(ix) for ix in idxs)),
                             "wall_s": round(time.perf_counter() - t0, 4)})
        return out

    from slice3d_tpu.mesh.extract import GridRefiner, extract_mesh_from_grid

    g = recon.generator
    logit_thr = float(np.log(g.threshold) - np.log(1 - g.threshold))
    refiner = GridRefiner(resolution0=g.resolution0,
                          upsampling_steps=g.upsampling_steps,
                          threshold=logit_thr, box_size=g.box_size,
                          chunk_size=g.chunk_size, dilate=g.dilate)

    trace_dir = None
    if args.trace:
        trace_dir = os.path.join(args.out, time.strftime("%Y%m%d-%H%M%S"))
        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    _, dense_vals2 = recon._encode_dense(
        recon.variables, *_stacked(recon, feed))
    dense_np = np.asarray(dense_vals2)
    t_dense = time.perf_counter() - t0

    stats = [{}]
    t0 = time.perf_counter()
    grids = refiner.build_batch(timed_evaluator, dense_np, stats)
    t_refine_total = time.perf_counter() - t0

    t0 = time.perf_counter()
    mesh = extract_mesh_from_grid(grids[0], logit_thr, g.box_size)
    t_march = time.perf_counter() - t0
    t_total = time.perf_counter() - t_all

    if args.trace:
        jax.profiler.stop_trace()

    # dense-eval MFU from XLA cost analysis
    mfu = None
    try:
        lowered = recon._encode_dense.lower(
            recon.variables, *_stacked(recon, feed))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = flops / t_dense / V5E_BF16_PEAK_FLOPS
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", e, file=sys.stderr)

    n0 = (args.res0 + 1) ** 3
    ledger = {
        "operating_point": f"res0={args.res0},up={args.up},chunk={args.chunk}",
        "encode_plus_dense_s": round(t_dense, 4),
        "dense_points": n0,
        "levels": level_ledger,
        "refine_levels_total_s": round(t_refine_total, 4),
        "n_points_evaluated": stats[0].get("n_points_evaluated"),
        "marching_s": round(t_march, 4),
        "total_s": round(t_total, 4),
        "mesh_verts": len(mesh.vertices),
        "dense_eval_mfu_est": round(mfu, 4) if mfu is not None else None,
        "trace_dir": trace_dir,
    }
    print(json.dumps(ledger, indent=2))


def _stacked(recon, feed):

    imgs, extras = recon._stack_inputs([feed])
    return (imgs,) + extras


if __name__ == "__main__":
    main()
