#!/usr/bin/env python
"""Chip A/B of the big-level sampling gather: 'rows' (4x take_along_axis)
vs 'patch' (one (2,2,C) lax.gather per level).

Measures the realistic folded-pyramid workload: the two gather-routed
levels (128^2 and 64^2 at S*d = 1536 channels, bf16) sampled at M points,
slope-timed (chained calls so dispatch/tunnel costs cancel).

Usage: python tools/bench_gather_mode.py [M] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from slice3d_tpu.models import sdf_head as sh

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    s, d = 12, 128
    rng = np.random.default_rng(0)
    levels = (128, 64)
    packed = [jnp.asarray(rng.normal(size=(1, hw, hw, s * d))
                          .astype(np.float32)).astype(jnp.bfloat16)
              for hw in levels]
    uv = jnp.asarray(np.clip(rng.uniform(-1, 1, size=(1, m, 2)), -1, 1)
                     .astype(np.float32))

    def run(mode):
        import os

        os.environ["SLICE3D_GATHER"] = mode
        planes = (sh.maybe_quad_pack(packed, hat_max_rows=0)
                  if mode == "quad" else packed)

        def fn(uvx, k):
            tot = jnp.float32(0)
            for i in range(k):
                out = sh.sample_packed_sum(
                    planes, uvx * (1.0 - 1e-6 * i), s, hat_max_rows=0)
                tot = tot + jnp.sum(out.astype(jnp.float32))
            return tot
        k1, k2 = 2, 8
        p50 = {}
        for k in (k1, k2):
            jf = jax.jit(lambda u, kk=k: fn(u, kk))
            float(jf(uv))  # compile
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(jf(uv))
                ts.append(time.perf_counter() - t0)
            p50[k] = float(np.median(ts))
        per = (p50[k2] - p50[k1]) / (k2 - k1)
        byte_sol = m * len(levels) * 4 * s * d * 2 / 819e9
        print(f"{mode:6s} {per * 1e3:8.2f} ms/call  "
              f"{m / per / 1e6:6.2f} M pts/s  "
              f"(bytes-SOL {byte_sol * 1e3:.2f} ms)", flush=True)
        return per

    modes = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["rows", "patch", "quad"])
    ts = {mode: run(mode) for mode in modes}
    base = ts.get("rows")
    if base:
        for mode, t in ts.items():
            if mode != "rows":
                print(f"{mode} speedup vs rows: {base / t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
