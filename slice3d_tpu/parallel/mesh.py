"""Device mesh construction for data/model parallelism.

The framework scales over ICI with two logical axes:

* ``data``  — batch / query-point sharding (pure data parallel; the SDF
  query axis is embarrassingly parallel, SURVEY §5).
* ``model`` — parameter sharding (FSDP-style weight sharding for the larger
  LDM UNet / VGG trunks; collectives are all-gathers on the kernel axis).

On a single chip both axes are size 1 and everything degenerates to plain
jit with no collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["create_mesh", "default_mesh", "init_distributed"]


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh.

    ``shape=None`` puts all devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=("data", "model"))


def default_mesh() -> Mesh:
    return create_mesh()


def reconstruction_mesh(shard_axis: str, batch_size: int, chunk_size: int,
                        n_dev: int):
    """Mesh-selection policy shared by reconstruct.py and serve.py.

    points: shard each object's query axis (needs chunk_size % n_dev == 0);
    batch: shard the object batch (needs batch_size > 1 divisible by
    n_dev).  Returns a Mesh or None; warns when an explicit points
    request can't be honored rather than silently falling back.
    """
    if n_dev <= 1:
        return None
    if shard_axis == "points":
        if chunk_size % n_dev != 0:
            print(f"warning: --mc_shard_axis points ignored — "
                  f"mc_chunk_size {chunk_size} not divisible by "
                  f"{n_dev} devices")
            return None
        return create_mesh((n_dev, 1))
    if batch_size > 1 and batch_size % n_dev == 0:
        return create_mesh((n_dev, 1))
    return None


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Join a multi-host (DCN) jax.distributed cluster.

    After this, ``jax.devices()`` is GLOBAL, so ``create_mesh`` builds the
    cross-host mesh unchanged and XLA routes the mesh collectives over
    DCN between hosts / ICI within them.  Values default from the
    ``SLICE3D_COORDINATOR`` / ``SLICE3D_NUM_PROCESSES`` /
    ``SLICE3D_PROCESS_ID`` env vars; a no-op (returns 1) when no cluster
    is configured.  Returns the process count.
    """
    import os

    coordinator = coordinator or os.environ.get("SLICE3D_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("SLICE3D_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("SLICE3D_PROCESS_ID", "0"))
    if not coordinator or num_processes <= 1:
        return 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return num_processes
