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

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]


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
