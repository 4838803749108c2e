#!/usr/bin/env python
"""Chip micro-bench of the separable lattice-slab sampler vs the gather
path at the real folded-pyramid shapes (slope-timed).

Times (a) lattice_sample_sum per 129x129 slab across all 5 levels,
(b) the old sample_packed_sum per 32k chunk, and (c) the per-slab hat
matrix build alone — so the dense-eval budget can be attributed.

Usage: python tools/bench_lattice_sample.py [reps]
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
    from slice3d_tpu.ops.lattice_sample import lattice_sample_sum

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    s, d = 12, 128
    nn = 129
    rng = np.random.default_rng(0)
    packed = [jnp.asarray(rng.normal(size=(1, hw, hw, s * d))
                          .astype(np.float32)).astype(jnp.bfloat16)
              for hw in (128, 64, 32, 16, 8)]
    u = jnp.asarray(np.linspace(-1, 1, nn).astype(np.float32))[None]
    m = 32768
    uv = jnp.asarray(np.clip(rng.uniform(-1, 1, size=(1, m, 2)), -1, 1)
                     .astype(np.float32))

    def slope(fn, x1, k1=2, k2=8):
        p50 = {}
        for k in (k1, k2):
            jf = jax.jit(lambda u, kk=k: fn(u, kk))
            jax.block_until_ready(jf(x1))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(jf(x1))
                ts.append(time.perf_counter() - t0)
            p50[k] = float(np.median(ts))
        return (p50[k2] - p50[k1]) / (k2 - k1)

    def lat(ux, k):
        tot = jnp.float32(0)
        for i in range(k):
            out = lattice_sample_sum(packed, ux * (1.0 - 1e-6 * i), ux, s)
            tot = tot + jnp.sum(out.astype(jnp.float32))
        return tot

    def gat(uvx, k):
        tot = jnp.float32(0)
        for i in range(k):
            out = sh.sample_packed_sum(packed, uvx * (1.0 - 1e-6 * i), s)
            tot = tot + jnp.sum(out.astype(jnp.float32))
        return tot

    t_lat = slope(lat, u)
    t_gat = slope(gat, uv)
    n_slab = nn * nn
    print(f"lattice slab: {t_lat*1e3:8.2f} ms/slab "
          f"({n_slab/t_lat/1e6:6.2f} M pts/s; 129 slabs = {129*t_lat:.3f}s)",
          flush=True)
    print(f"gather 32k  : {t_gat*1e3:8.2f} ms/chunk "
          f"({m/t_gat/1e6:6.2f} M pts/s; 66 chunks = {66*t_gat:.3f}s)",
          flush=True)


if __name__ == "__main__":
    main()
