"""NamedSharding helpers: batch sharding + FSDP-style param sharding."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["batch_sharding", "replicate", "shard_params_fsdp", "put_batch"]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(x: Any, mesh: Mesh, min_size: int) -> NamedSharding:
    """Shard the largest divisible axis of big params over 'model'."""
    n_model = mesh.shape["model"]
    shape = getattr(x, "shape", ())
    if n_model <= 1 or not shape or np.prod(shape) < min_size:
        return replicate(mesh)
    # prefer the last axis (output features) for matmul-friendly all-gathers
    for axis in reversed(range(len(shape))):
        if shape[axis] % n_model == 0 and shape[axis] >= n_model:
            spec = [None] * len(shape)
            spec[axis] = "model"
            return NamedSharding(mesh, P(*spec))
    return replicate(mesh)


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Place a param pytree with FSDP-style sharding over the 'model' axis."""
    specs = jax.tree_util.tree_map(lambda x: _fsdp_spec(x, mesh, min_size), params)
    return jax.tree_util.tree_map(jax.device_put, params, specs), specs


def put_batch(batch, mesh: Mesh):
    """Device-put a host batch dict with leading-axis data sharding.

    Leaves whose batch axis is not divisible by the data-axis size are
    replicated instead (small eval batches, odd remainders).

    Multi-host (``jax.process_count() > 1``): each process passes its
    LOCAL portion of the batch (global batch = process_count x local;
    every host runs its own loader over its own data shard) and arrays
    are assembled per-shard with no cross-host data movement; replicated
    leaves must be identical on every host.
    """
    n_data = mesh.shape["data"]
    data_sh = batch_sharding(mesh)
    repl = replicate(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        shape = getattr(x, "shape", ())
        if multihost:
            import numpy as np

            x = np.asarray(x)
            n_global = shape[0] * jax.process_count() if shape else 0
            ok = len(shape) > 0 and n_global % n_data == 0
            return jax.make_array_from_process_local_data(
                data_sh if ok else repl, x)
        ok = len(shape) > 0 and shape[0] % n_data == 0
        return jax.device_put(x, data_sh if ok else repl)

    return jax.tree_util.tree_map(put, batch)
