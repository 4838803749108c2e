"""Per-level plane-sampling strategy ablation on the chip.

Shapes mirror the real SliceNet folded-packed pyramid at 128px input:
1536-channel (12 slices x d=128) levels of 128/64/32/16/8 square.  For
each routing policy (``hat_max_rows``: levels with h*w <= the cutoff use
the dense hat-basis matmul of ops/hat_sample.py, the rest the 4-corner
row gather) the harness times a 16-chunk lax.scan over 32k-point chunks
— the production dispatch shape — then isolates each level under both
strategies.  Ledger source for the BASELINE.md hat ablation table.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from slice3d_tpu.models.sdf_head import sample_packed_sum
    from slice3d_tpu.ops.hat_sample import hat_sample_sum

    C = 1536
    M = 32768
    K = 16
    rng = np.random.default_rng(0)
    sizes = [128, 64, 32, 16, 8]
    planes = [jnp.asarray(rng.normal(size=(1, s, s, C)).astype(np.float32),
                          dtype=jnp.bfloat16) for s in sizes]
    uv_all = jnp.asarray(
        rng.uniform(-0.98, 0.98, (K, 1, M, 2)).astype(np.float32))

    def run_sum(uvk, max_rows):
        def body(carry, uv):
            tot = sample_packed_sum(planes, uv, n_slices=12,
                                    hat_max_rows=max_rows)
            return carry, jnp.sum(tot, axis=-1)

        _, out = jax.lax.scan(body, 0, uvk)
        return out

    def timeit(fn, *args):
        f = jax.jit(fn)
        o = f(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = f(*args)
            jax.block_until_ready(o)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    npts = K * M
    for max_rows in [0, 256, 1024, 4096, 16384]:
        t = timeit(functools.partial(run_sum, max_rows=max_rows), uv_all)
        print(f"max_rows={max_rows:6d}: {t * 1e3:8.2f} ms  "
              f"{npts / t / 1e6:7.2f} Mpts/s", flush=True)

    for i, s in enumerate(sizes):
        one = [planes[i]]

        def run_one(uvk, strat):
            def body(carry, uv):
                if strat == "hat":
                    tot, _ = hat_sample_sum(one, uv, max_rows=10 ** 9)
                else:
                    g = sample_packed_sum(one, uv, n_slices=12,
                                          hat_max_rows=0)
                    tot = g.reshape(g.shape[0], g.shape[1], -1)
                return carry, jnp.sum(tot, axis=-1)

            _, out = jax.lax.scan(body, 0, uvk)
            return out

        tg = timeit(functools.partial(run_one, strat="gather"), uv_all)
        th = timeit(functools.partial(run_one, strat="hat"), uv_all)
        print(f"level {s:3d}^2: gather {tg * 1e3:8.2f} ms "
              f"({npts / tg / 1e6:6.2f} M/s)   hat {th * 1e3:8.2f} ms "
              f"({npts / th / 1e6:6.2f} M/s)", flush=True)


if __name__ == "__main__":
    main()
