"""Measure the REFERENCE's reconstruction hot loop on this host (torch CPU)
against ours on the same host — the measured baseline the vs_baseline
columns cite.

The reference path (reg_slices/reconstruct.py:74-102 eval_points +
src/models.py:48-84 forward) re-runs the ENTIRE network — VGG16-BN
encoder, 12-slice U-Net decoder, plane sampling, 13-token transformer —
for every 3000-point MISE chunk.  The twin here (tests/torch_refs.py::
TorchSliceNetRef, the numeric-parity twin of the reference model) measures
exactly that per-chunk cost; reference objects/min follows from the
headline operating point's ~675k evaluated points (mc_res0 64, up 2 —
BENCH_r0x n_points_evaluated ~400k refined + 275k coarse).

Ours on the same host CPU: encode ONCE, folded planes, chunked fused
queries (slice3d_tpu/pipeline.py) over the same number of points.

Prints one JSON line; ledger source for BASELINE.md and the
``vs_baseline`` columns of bench_all.py (baseline_source records that the
reference number is the torch twin measured on this host's CPU — no A100
is available in this environment, and no measured A100 figure exists in
the reference repo or paper artifacts we can verify).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

TOTAL_POINTS = 675_000  # coarse 65^3 + ~400k refined at the headline point
REF_CHUNK = 3000        # reference reconstruct.py:76 chunk_size


def bench_reference_twin(n_chunks: int = 3) -> dict:
    import torch

    from torch_refs import TorchSliceNetRef

    torch.manual_seed(0)
    model = TorchSliceNetRef().eval()
    img = torch.randn(1, 3, 128, 128)
    trans = torch.eye(4, 3).unsqueeze(0)

    with torch.no_grad():
        qry = torch.rand(1, REF_CHUNK, 3) - 0.5
        model(img, qry, trans)  # warmup
        times = []
        for i in range(n_chunks):
            qry = torch.rand(1, REF_CHUNK, 3) - 0.5
            t0 = time.perf_counter()
            model(img, qry, trans)
            times.append(time.perf_counter() - t0)
    t_chunk = float(np.median(times))
    pts_per_s = REF_CHUNK / t_chunk
    return {
        "ref_twin_s_per_3000pt_chunk": round(t_chunk, 3),
        "ref_twin_pts_per_s": round(pts_per_s, 1),
        "ref_twin_est_s_per_object": round(TOTAL_POINTS / pts_per_s, 1),
        "ref_twin_est_objects_per_min": round(60 * pts_per_s / TOTAL_POINTS, 4),
    }


def bench_ours_cpu(n_points: int = 131072, chunk: int = 16384) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from slice3d_tpu import camera
    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables

    opts = Options(name_model="slicenet", img_size=128, dtype="float32")
    model = build_model(opts)
    variables = init_variables(model, opts)
    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)

    @jax.jit
    def encode(variables, img):
        return model.apply(variables, img, method=model.encode_folded)

    @jax.jit
    def query(variables, packed, pts, trans):
        def body(carry, p):
            qry = p * jnp.array([1.0, -1.0, -1.0])
            return carry, model.apply(variables, packed, qry, trans,
                                      method=model.query_folded)

        _, vals = jax.lax.scan(body, 0, pts)
        return vals

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32))
    trans = jnp.asarray(proj[None].astype(np.float32))
    k = n_points // chunk
    pts = jnp.asarray(
        rng.uniform(-0.5, 0.5, (k, 1, chunk, 3)).astype(np.float32))

    packed, _ = encode(variables, img)
    v = query(variables, packed, pts, trans)
    jax.block_until_ready(v)  # warmup both programs

    t0 = time.perf_counter()
    packed, _ = encode(variables, img)
    jax.block_until_ready(packed)
    t_enc = time.perf_counter() - t0

    t0 = time.perf_counter()
    v = query(variables, packed, pts, trans)
    jax.block_until_ready(v)
    t_query = time.perf_counter() - t0

    pts_per_s = n_points / t_query
    est_s = t_enc + TOTAL_POINTS / pts_per_s
    return {
        "ours_cpu_encode_s": round(t_enc, 3),
        "ours_cpu_pts_per_s": round(pts_per_s, 1),
        "ours_cpu_est_s_per_object": round(est_s, 1),
        "ours_cpu_est_objects_per_min": round(60 / est_s, 4),
    }


def main():
    ref = bench_reference_twin()
    ours = bench_ours_cpu()
    out = {
        "metric": "reference_twin_same_host_cpu",
        "operating_point": "mc_res0 64, up 2 (~675k pts), 128px slicenet",
        **ref,
        **ours,
        "same_host_speedup":
            round(ours["ours_cpu_est_objects_per_min"]
                  / ref["ref_twin_est_objects_per_min"], 2),
        "baseline_source": "torch twin of the reference hot loop "
                           "(full-network recompute per 3000-pt chunk), "
                           "this host's CPU",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
