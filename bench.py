#!/usr/bin/env python
"""Benchmark: single RGBA image -> 12 slices -> SDF grid -> mesh.

BASELINE.json config 1, the headline path, at the reference's FULL-QUALITY
operating point (`mc_res0 64 --mc_up_steps 2` = 256^3-effective,
reference options.py:45-48).  Measures end-to-end p50 latency (device
encode + chunked SDF queries + native marching on host).  North-star
target: 2.0 s p50 (BASELINE.md), so ``vs_baseline = 2.0 / p50`` (>1 means
the target is met).  ``bench_all.py`` covers BASELINE configs 2-5.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

TARGET_P50_S = 2.0


def main():
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables
    from slice3d_tpu.pipeline import Reconstructor

    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    res0 = int(os.environ.get("BENCH_RES0", "64"))
    up_steps = int(os.environ.get("BENCH_UP_STEPS", "2"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32768"))

    opts = Options(name_model="slicenet", img_size=128, dtype="bfloat16",
                   mc_res0=res0, mc_up_steps=up_steps, mc_chunk_size=chunk,
                   random_init=True)
    model = build_model(opts)
    variables = init_variables(model, opts)

    recon = Reconstructor(
        model, variables,
        resolution0=res0, upsampling_steps=up_steps,
        threshold=0.5, chunk_size=chunk,
    )

    rng = np.random.default_rng(0)
    rot = np.eye(3, dtype=np.float32)
    from slice3d_tpu import camera

    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)
    feed = {
        "img_input": rng.normal(size=(128, 128, 3)).astype(np.float32),
        "trans_mat_wo_rot_tp": proj.astype(np.float32),
    }

    # warmup (compile)
    mesh, stats = recon.reconstruct(feed)

    verbose = os.environ.get("BENCH_VERBOSE", "")
    times = []
    for i in range(repeats):
        feed["img_input"] = rng.normal(size=(128, 128, 3)).astype(np.float32)
        t0 = time.perf_counter()
        mesh, stats = recon.reconstruct(feed)
        times.append(time.perf_counter() - t0)
        if verbose:
            print(f"run {i}: {times[-1]:.3f}s {stats}", file=sys.stderr)

    p50 = float(np.median(times))
    result = {
        "metric": "single_image_to_mesh_p50_s",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_P50_S / p50, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
