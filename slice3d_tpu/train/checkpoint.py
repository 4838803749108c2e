"""Checkpointing: orbax-backed save/restore with reference-style naming.

Semantics follow the reference (reg_slices/train.py:167-176): checkpoints
carry {model variables, opt_state, n_epoch, n_iter}, are written every
``freq_ckpt`` epochs under ``experiments/<exp>/ckpt`` with metric-bearing
filenames, and ``--resume`` picks the newest by mtime.  Torch ``.ckpt``
files from the reference are importable via
:mod:`slice3d_tpu.convert.torch_import` model converters.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint",
           "TopKCheckpointer"]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any]) -> str:
    """Serialize a pytree state dict to ``path`` (single msgpack file)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # to_state_dict flattens optimizer NamedTuples etc. into plain dicts
    payload = serialization.msgpack_serialize(
        _to_host(serialization.to_state_dict(state))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
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
                 k: int = 3, mode: str = "min"):
        assert mode in ("min", "max")
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.k = k
        self.mode = mode
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
        save_checkpoint(path, state)
        self.best.append((score, path))
        self.best.sort(key=lambda t: t[0])
        while len(self.best) > self.k:
            _, worst = self.best.pop()
            try:
                os.remove(worst)
            except OSError:
                pass
        return path
