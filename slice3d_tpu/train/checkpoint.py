"""Checkpointing: msgpack + orbax backends with reference-style naming.

Semantics follow the reference (reg_slices/train.py:167-176): checkpoints
carry {model variables, opt_state, n_epoch, n_iter}, are written every
``freq_ckpt`` epochs under ``experiments/<exp>/ckpt`` with metric-bearing
filenames, and ``--resume`` picks the newest by mtime.  Torch ``.ckpt``
files from the reference are importable via
:mod:`slice3d_tpu.convert.torch_import` model converters.

Backends (``--ckpt_backend``):

* ``msgpack`` (default): one flax-serialized file; everything is pulled
  to host first.  Simple, portable, right for single-host research runs.
* ``orbax``: an orbax-checkpoint directory.  Sharded (FSDP) arrays are
  written per-shard by the devices that own them and can be restored
  directly into their shardings — no host gather, the multi-chip
  production path.
* ``orbax_async``: same format, but the device-to-storage copy runs in
  a background thread so the train loop is not blocked; pending writes
  are flushed by :func:`wait_pending` (installed atexit).

``restore_checkpoint`` auto-detects the format (orbax checkpoints are
directories, msgpack checkpoints are files).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint",
           "wait_pending", "TopKCheckpointer"]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# -- orbax backend ---------------------------------------------------------

_SYNC_CKPTR = None
_ASYNC_CKPTR = None


def _orbax_ckptr(async_: bool):
    """Lazily build (and cache) the orbax checkpointer objects."""
    global _SYNC_CKPTR, _ASYNC_CKPTR
    import orbax.checkpoint as ocp

    if async_:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            import atexit

            # Backstop only: orbax cannot schedule its asyncio worker
            # threads during interpreter shutdown, so a save still in
            # flight THIS late can fail — train loops flush explicitly
            # via wait_pending() before returning.
            def _wait_at_exit():
                try:
                    wait_pending()
                except Exception as e:
                    print(f"warning: async checkpoint flush at exit "
                          f"failed: {e}")

            atexit.register(_wait_at_exit)
        return _ASYNC_CKPTR
    if _SYNC_CKPTR is None:
        _SYNC_CKPTR = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    return _SYNC_CKPTR


def wait_pending() -> None:
    """Block until every ``orbax_async`` save has reached storage."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path: str, state: Dict[str, Any],
                    backend: str = "msgpack") -> str:
    """Serialize a pytree state dict to ``path``.

    ``msgpack``: single flax msgpack file.  ``orbax``/``orbax_async``:
    orbax-checkpoint directory (sharded arrays written per-shard; async
    variant returns before the storage copy completes — see
    :func:`wait_pending`).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict flattens optimizer NamedTuples etc. into plain dicts
    tree = serialization.to_state_dict(state)
    if backend in ("orbax", "orbax_async"):
        async_ = backend == "orbax_async"
        if async_:
            wait_pending()  # one in-flight save at a time
        ckptr = _orbax_ckptr(async_)
        ckptr.save(os.path.abspath(path), tree, force=True)
        return path
    if backend != "msgpack":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    payload = serialization.msgpack_serialize(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint written by :func:`save_checkpoint` (format is
    auto-detected: orbax checkpoints are directories).

    With a ``target``, the orbax path restores THROUGH the target as a
    template: jax arrays come back with the template's sharding (each
    device reads its own shards — no host gather), which is the point of
    the orbax backend for FSDP states.
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        wait_pending()  # the path may still be being written
        ckptr = _orbax_ckptr(False)
        if target is not None:
            template = serialization.to_state_dict(target)
            tree = ckptr.restore(os.path.abspath(path),
                                 args=ocp.args.StandardRestore(template))
        else:
            tree = ckptr.restore(os.path.abspath(path))
    else:
        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
    if target is not None:
        tree = serialization.from_state_dict(target, tree)
    return tree


def latest_checkpoint(ckpt_dir: str, pattern: str = "*.ckpt") -> Optional[str]:
    files = glob.glob(os.path.join(ckpt_dir, pattern))
    if not files:
        return None
    return max(files, key=os.path.getmtime)


class TopKCheckpointer:
    """Keep the k best checkpoints by a monitored metric (+ ``last.ckpt``).

    Mirrors the reference ModelCheckpoint setup (gen_slices/main.py:576-597):
    ``save_top_k=3`` on ``model.monitor`` (``val/loss_simple_ema``), min
    mode, plus an always-updated ``last.ckpt``.  Filenames carry the step
    and metric so ``ls`` shows training health, matching the reference's
    metric-in-filename convention.
    """

    def __init__(self, ckpt_dir: str, monitor: str = "val/loss_simple_ema",
                 k: int = 3, mode: str = "min", backend: str = "msgpack"):
        assert mode in ("min", "max")
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.k = k
        self.mode = mode
        self.backend = backend
        self.best: list = []  # [(score, path)] sorted best-first
        # Seed from checkpoints already on disk so a resumed run keeps
        # pruning against the previous run's best (otherwise files
        # accumulate past k across restarts).
        tag = self.monitor.replace("/", "_")
        for path in glob.glob(os.path.join(ckpt_dir, f"step=*-{tag}=*.ckpt")):
            try:
                value = float(path.rsplit(f"{tag}=", 1)[1][:-len(".ckpt")])
            except (IndexError, ValueError):
                continue
            self.best.append((value if mode == "min" else -value, path))
        self.best.sort(key=lambda t: t[0])

    def update(self, value: float, step: int, state: Dict[str, Any]) -> Optional[str]:
        """Save ``state`` if ``value`` ranks in the top k. Returns the path."""
        score = value if self.mode == "min" else -value
        if len(self.best) >= self.k and score >= self.best[-1][0]:
            return None
        tag = self.monitor.replace("/", "_")
        path = os.path.join(
            self.ckpt_dir, f"step={step:06d}-{tag}={value:.5f}.ckpt")
        save_checkpoint(path, state, backend=self.backend)
        self.best.append((score, path))
        self.best.sort(key=lambda t: t[0])
        while len(self.best) > self.k:
            _, worst = self.best.pop()
            try:
                if os.path.isdir(worst):  # orbax checkpoints are dirs
                    import shutil

                    wait_pending()  # never rmtree a write in flight
                    shutil.rmtree(worst)
                else:
                    os.remove(worst)
            except OSError:
                pass
        return path
