#!/usr/bin/env python
"""Benchmark: single RGBA image -> 12 slices -> SDF grid -> mesh.

BASELINE.json config 1, the headline path, at the reference's FULL-QUALITY
operating point (`mc_res0 64 --mc_up_steps 2` = 256^3-effective,
reference options.py:45-48).  Measures end-to-end p50 latency (device
encode + chunked SDF queries + native marching on host).  North-star
target: 2.0 s p50 (BASELINE.md), so ``vs_baseline = 2.0 / p50`` (>1 means
the target is met).  ``bench_all.py`` covers BASELINE configs 2-5.

Workload is FROZEN for round-over-round comparability: weights from the
deterministic seed-0 init, inputs from a fixed procedural pattern (no
generator-state dependence), and the JSON records ``n_points_evaluated``
so any drift in the refinement point stream is visible, plus
``sdf_points_per_sec_128`` — a dense 129^3 lattice eval (the second
BASELINE.json metric, init-independent by construction: every lattice
point is evaluated regardless of the field).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

TARGET_P50_S = 2.0
V5E_BF16_PEAK_FLOPS = 197e12


def _frozen_images(n, size=128):
    """Deterministic inputs: a fixed-seed Gaussian stream (the same frozen
    workload as the round-2 ledger — a seeded generator is exactly as
    reproducible as a procedural pattern, and with the seed-0 random-init
    net it yields a realistic ~0.5M-point refined surface budget, where
    smooth low-frequency patterns produced an unrealistically wiggly 1.5M+
    field).  ``n_points_evaluated`` in the JSON makes any budget drift
    visible."""
    rng = np.random.default_rng(0)
    return [rng.normal(size=(size, size, 3)).astype(np.float32)
            for _ in range(n)]


def main():
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables
    from slice3d_tpu.pipeline import Reconstructor

    repeats = int(os.environ.get("BENCH_REPEATS", "7"))
    res0 = int(os.environ.get("BENCH_RES0", "64"))
    up_steps = int(os.environ.get("BENCH_UP_STEPS", "2"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32768"))

    opts = Options(name_model="slicenet", img_size=128, dtype="bfloat16",
                   mc_res0=res0, mc_up_steps=up_steps, mc_chunk_size=chunk,
                   random_init=True)
    model = build_model(opts)
    variables = init_variables(model, opts)  # deterministic seed-0 init

    recon = Reconstructor(
        model, variables,
        resolution0=res0, upsampling_steps=up_steps,
        threshold=0.5, chunk_size=chunk,
    )

    from slice3d_tpu import camera

    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)
    images = _frozen_images(repeats + 1)
    feed = {
        "img_input": images[0],
        "trans_mat_wo_rot_tp": proj.astype(np.float32),
    }

    # warmup (compile)
    mesh, stats = recon.reconstruct(feed)

    # Warm the tunnel's d2h path: the axon link shows transient stalls
    # (measured 2026-08-18: a 16 MB pull at 0.2 MB/s right after compute,
    # then a steady ~46 MB/s).  Pull a ~1 MB buffer until two consecutive
    # pulls are fast so timing starts on a healthy link.
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda x: x * 1.0)(jnp.zeros((512, 512), jnp.float32))
    fast = 0
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(probe)
        fast = fast + 1 if time.perf_counter() - t0 < 0.25 else 0
        if fast >= 2:
            break

    verbose = os.environ.get("BENCH_VERBOSE", "")
    times, n_points, eval_times = [], [], []
    for i in range(repeats):
        feed["img_input"] = images[i + 1]
        t0 = time.perf_counter()
        mesh, stats = recon.reconstruct(feed)
        times.append(time.perf_counter() - t0)
        n_points.append(stats["n_points_evaluated"])
        eval_times.append(stats["time_eval_points"])
        if verbose:
            print(f"run {i}: {times[-1]:.3f}s {stats}", file=sys.stderr)

    # Link-stall censoring: runs caught in a tunnel OUTAGE measure the
    # link, not the pipeline (device work is identical every run —
    # `n_points_evaluated` pins that; a concurrent-pull probe showed the
    # outage is link-wide, ~10-20 s, so retries/hedging cannot mask it).
    # Censor only true outages — runs >4 s over the fastest — so ordinary
    # jitter stays in the distribution; report the drop count and the
    # uncensored median alongside.
    t_arr = np.asarray(times)
    keep = t_arr <= t_arr.min() + 4.0
    p50_raw = float(np.median(t_arr))
    n_dropped = int((~keep).sum())
    p50 = float(np.median(t_arr[keep]))

    # -- second BASELINE.json metric: dense SDF points/sec/chip at 128^3 --
    # A dense lattice evaluates EVERY point, so this number cannot drift
    # with init: one fused encode+dense dispatch at res0=128, up=0.
    dense = Reconstructor(
        model, variables, resolution0=128, upsampling_steps=0,
        threshold=0.5, chunk_size=chunk,
    )
    dense.reconstruct(feed)  # compile
    t0 = time.perf_counter()
    _, dstats = dense.reconstruct(feed)
    n128 = 129 ** 3
    pps = n128 / dstats["time_eval_points"]

    # MFU of the dense eval from an analytic FLOP count of the fused SDF
    # head (XLA cost_analysis returns a stub under remote compile).  Per
    # query point: fc_p + 3 post-LN encoder layers over 13 tokens at
    # d=128 with a 2048-wide FFN (the last layer's FFN runs on the read
    # token only — see sdf_head._decode_tokens), + the fc_out read.
    t, d, f, layers = 13, 128, 2048, 3
    per_layer = (2 * t * d * 3 * d      # qkv
                 + 2 * 2 * t * t * d    # scores + apply
                 + 2 * t * d * d        # out proj
                 + 2 * 2 * t * d * f)   # FFN
    last_saving = 2 * 2 * (t - 1) * d * f
    flops_per_point = 2 * 3 * d + layers * per_layer - last_saving + 2 * d
    mfu = (flops_per_point * n128 / dstats["time_eval_points"]
           / V5E_BF16_PEAK_FLOPS)

    result = {
        "metric": "single_image_to_mesh_p50_s",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_P50_S / p50, 4),
        "p50_raw_s": round(p50_raw, 4),
        "n_link_stall_outliers": n_dropped,
        "n_points_evaluated": int(np.median(n_points)),
        "eval_s": round(float(np.median(eval_times)), 4),
        "refined_points_per_sec": round(
            float(np.median(n_points)) / float(np.median(eval_times)), 1),
        "sdf_points_per_sec_128": round(pps, 1),
        "dense_128_eval_s": round(dstats["time_eval_points"], 4),
        "dense_eval_mfu_est": round(mfu, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
