#!/usr/bin/env python
"""Benchmark: single RGBA image -> 12 slices -> SDF grid -> mesh.

BASELINE.json config 1, the headline path, at the reference's FULL-QUALITY
operating point (`mc_res0 64 --mc_up_steps 2` = 256^3-effective,
reference options.py:45-48).  Measures end-to-end p50 latency (device
encode + chunked SDF queries + native marching on host).  North-star
target: 2.0 s p50 (BASELINE.md), so ``vs_baseline = 2.0 / p50`` (>1 means
the target is met).  ``bench_all.py`` covers BASELINE configs 2-8.

Workload is FROZEN for round-over-round comparability: weights from the
deterministic seed-0 init, inputs from a fixed procedural pattern (no
generator-state dependence), and the JSON records ``n_points_evaluated``
so any drift in the refinement point stream is visible, plus
``sdf_points_per_sec_128`` — a dense 129^3 lattice eval (the second
BASELINE.json metric, init-independent by construction: every lattice
point is evaluated regardless of the field).

Capture hardening (round 5): the tunneled chip has documented multi-hour
outages and a single wedged dispatch used to erase the whole record
(BENCH_r04: rc=124, nothing printed).  Now:

  * a WATCHDOG thread emits the best-known JSON line and exits 0 when
    ``BENCH_BUDGET_S`` (default 540 s) expires — a wedged jax call can
    no longer produce an empty capture;
  * the headline p50 line is printed IMMEDIATELY after the repeat loop
    (flushed), before the dense eval; the final line is a superset;
  * partial results are kept after every phase and every timed run, so
    a mid-loop wedge still reports the median of completed runs;
  * repeats degrade (7 -> 3) when warmup ate the budget, and the dense
    eval is skipped when <15% of the budget remains;
  * the link-stall censoring policy is PINNED and recorded in the JSON:
    drop runs slower than fastest+4.0 s (true link outages only; see
    BASELINE.md round-4 concurrent-pull probe), report ``p50_raw_s``
    and the drop count alongside.

Prints 1-2 JSON lines; the LAST line is the most complete capture.
"""

import json
import os
import sys
import threading
import time

import numpy as np

TARGET_P50_S = 2.0
V5E_BF16_PEAK_FLOPS = 197e12
CENSOR_SLACK_S = 4.0
CENSOR_POLICY = "drop runs > fastest + 4.0s (link outage); pinned round 4"

_T0 = time.time()
_LOCK = threading.Lock()
_STATE = {"phase": "import", "result": None, "done": False}


def _elapsed():
    return time.time() - _T0


def _set_phase(phase):
    with _LOCK:
        _STATE["phase"] = phase


def _set_result(result):
    with _LOCK:
        _STATE["result"] = dict(result)


def _emit(result):
    print(json.dumps(result), flush=True)


def _watchdog(budget_s):
    """Emit the best-known result and exit 0 at budget expiry.

    os._exit is deliberate: a wedged tunnel dispatch cannot be
    interrupted from Python, and the driver's own timeout (rc=124)
    discards stdout-less runs.  Exiting under our own budget keeps
    rc=0 with a parseable tail line no matter where the wedge is.
    """
    while True:
        remaining = budget_s - _elapsed()
        if remaining <= 0:
            break
        time.sleep(min(remaining, 1.0))
        with _LOCK:
            if _STATE["done"]:
                return
    with _LOCK:
        if _STATE["done"]:
            return
        result = _STATE["result"] or {
            "metric": "single_image_to_mesh_p50_s", "value": None,
            "unit": "s", "vs_baseline": None,
        }
        result = dict(result)
        result["budget_exceeded_in_phase"] = _STATE["phase"]
        result["budget_s"] = budget_s
        result["elapsed_s"] = round(_elapsed(), 1)
        _emit(result)
    os._exit(0)


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


def _headline(times, n_points, eval_times):
    """Censored p50 + supporting fields from the completed runs."""
    t_arr = np.asarray(times)
    keep = t_arr <= t_arr.min() + CENSOR_SLACK_S
    p50 = float(np.median(t_arr[keep]))
    out = {
        "metric": "single_image_to_mesh_p50_s",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_P50_S / p50, 4),
        "p50_raw_s": round(float(np.median(t_arr)), 4),
        "n_runs": len(times),
        "n_link_stall_outliers": int((~keep).sum()),
        "censor_policy": CENSOR_POLICY,
    }
    if n_points:
        out["n_points_evaluated"] = int(np.median(n_points))
    if eval_times:
        out["eval_s"] = round(float(np.median(eval_times)), 4)
        if n_points:
            out["refined_points_per_sec"] = round(
                float(np.median(n_points)) / float(np.median(eval_times)), 1)
    return out


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "540"))
    threading.Thread(target=_watchdog, args=(budget_s,), daemon=True).start()

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables
    from slice3d_tpu.pipeline import Reconstructor

    repeats = int(os.environ.get("BENCH_REPEATS", "7"))
    res0 = int(os.environ.get("BENCH_RES0", "64"))
    up_steps = int(os.environ.get("BENCH_UP_STEPS", "2"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32768"))

    _set_phase("build")
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
    _set_phase("warmup_compile")
    mesh, stats = recon.reconstruct(feed)

    # Warm the tunnel's d2h path: the axon link shows transient stalls
    # (measured 2026-08-18: a 16 MB pull at 0.2 MB/s right after compute,
    # then a steady ~46 MB/s).  Pull a ~1 MB buffer until two consecutive
    # pulls are fast so timing starts on a healthy link.
    _set_phase("link_warm")
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

    # budget-aware degradation: a slow compile/warmup (degraded tunnel)
    # means fewer repeats, not an empty capture
    if _elapsed() > 0.4 * budget_s:
        repeats = min(repeats, 3)

    verbose = os.environ.get("BENCH_VERBOSE", "")
    times, n_points, eval_times = [], [], []
    _set_phase("timed_runs")
    # adaptive sampling: link-stall runs measure the tunnel, not the
    # pipeline — keep running (budget permitting, capped) until `repeats`
    # CLEAN runs exist, so a stall burst cannot reduce the capture to a
    # single usable sample
    max_runs = int(os.environ.get("BENCH_MAX_RUNS", str(2 * repeats)))
    i = -1
    while True:
        i += 1
        if i >= max_runs:
            break
        if times:
            n_clean = sum(t <= min(times) + CENSOR_SLACK_S for t in times)
            if n_clean >= repeats or _elapsed() > 0.75 * budget_s:
                break
        feed["img_input"] = images[i % repeats + 1]
        t0 = time.perf_counter()
        mesh, stats = recon.reconstruct(feed)
        times.append(time.perf_counter() - t0)
        n_points.append(stats["n_points_evaluated"])
        eval_times.append(stats["time_eval_points"])
        _set_result(_headline(times, n_points, eval_times))
        if verbose:
            print(f"run {i}: {times[-1]:.3f}s {stats}", file=sys.stderr)

    # Early emission: the headline capture exists from this point on even
    # if the dense eval below wedges (the driver parses the tail line).
    result = _headline(times, n_points, eval_times)
    with _LOCK:
        _STATE["result"] = dict(result)
        _emit(result)

    # -- second BASELINE.json metric: dense SDF points/sec/chip at 128^3 --
    # A dense lattice evaluates EVERY point, so this number cannot drift
    # with init: one fused encode+dense dispatch at res0=128, up=0.
    if _elapsed() <= 0.85 * budget_s:
        _set_phase("dense_eval")
        dense = Reconstructor(
            model, variables, resolution0=128, upsampling_steps=0,
            threshold=0.5, chunk_size=chunk,
        )
        dense.reconstruct(feed)  # compile
        t0 = time.perf_counter()
        _, dstats = dense.reconstruct(feed)
        n128 = 129 ** 3
        pps = n128 / dstats["time_eval_points"]

        # MFU of the dense eval from an analytic FLOP count of the fused
        # SDF head (XLA cost_analysis returns a stub under remote
        # compile).  Per query point: fc_p + 3 post-LN encoder layers over
        # 13 tokens at d=128 with a 2048-wide FFN (the last layer's FFN
        # runs on the read token only — see sdf_head._decode_tokens),
        # + the fc_out read.
        t, d, f, layers = 13, 128, 2048, 3
        per_layer = (2 * t * d * 3 * d      # qkv
                     + 2 * 2 * t * t * d    # scores + apply
                     + 2 * t * d * d        # out proj
                     + 2 * 2 * t * d * f)   # FFN
        last_saving = 2 * 2 * (t - 1) * d * f
        flops_per_point = 2 * 3 * d + layers * per_layer - last_saving + 2 * d
        mfu = (flops_per_point * n128 / dstats["time_eval_points"]
               / V5E_BF16_PEAK_FLOPS)
        result["sdf_points_per_sec_128"] = round(pps, 1)
        result["dense_128_eval_s"] = round(dstats["time_eval_points"], 4)
        result["dense_eval_mfu_est"] = round(mfu, 4)
    else:
        result["dense_eval_skipped"] = "budget"

    result["elapsed_s"] = round(_elapsed(), 1)
    result["budget_s"] = budget_s
    with _LOCK:
        _STATE["result"] = dict(result)
        _STATE["done"] = True
        _emit(result)


if __name__ == "__main__":
    main()
