"""Model factory + weight loading shared by the CLIs."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from .gtslice import GTSliceModel
from .slicenet import SliceNetModel

__all__ = ["build_model", "init_variables", "load_model_variables"]


def build_model(opts: Options, *, train: bool = False):
    dtype = jnp.bfloat16 if (opts.dtype == "bfloat16" and not train) else None
    common = dict(n_slices=opts.n_slices, train_bn=False, dtype=dtype,
                  fused_ffn=not train)
    if opts.name_model == "slicenet":
        return SliceNetModel(**common)
    if opts.name_model == "gtslice":
        return GTSliceModel(**common)
    if opts.name_model == "disn":
        from .disn import DISNModel

        return DISNModel(train_bn=False, dtype=dtype)
    raise ValueError(f"unknown model '{opts.name_model}'")


def init_variables(model, opts: Options, seed: int = 0):
    # model.init runs as ONE jitted program: executed eagerly it is
    # hundreds of op-by-op dispatches, which over the tunneled chip's
    # ~100 ms RTT costs minutes of pure round trips (measured 194 s for
    # slicenet@128 before this; one compiled — and persistently cached —
    # program runs in seconds).
    rng = jax.random.PRNGKey(seed)
    s = opts.img_size
    qry = jnp.zeros((1, 8, 3), jnp.float32)
    trans = jnp.asarray(np.eye(4, 3, dtype=np.float32))[None]
    init = jax.jit(model.init)
    if isinstance(model, SliceNetModel):
        img = jnp.zeros((1, s, s, 3), jnp.float32)
        return init(rng, img, qry, trans, jnp.eye(3)[None])
    if isinstance(model, GTSliceModel):
        slices = jnp.zeros((1, opts.n_slices, s, s, 3), jnp.float32)
        return init(rng, slices, qry, trans, jnp.eye(3)[None])
    img = jnp.zeros((1, s, s, 3), jnp.float32)
    return init(rng, img, qry, trans, jnp.eye(3)[None])


def load_model_variables(model, opts: Options, ckpt_path: Optional[str]):
    """Load variables from our msgpack ckpt or a reference torch ckpt."""
    if ckpt_path is None or opts.random_init:
        return init_variables(model, opts)

    from ..train.checkpoint import restore_checkpoint

    if _is_torch_file(ckpt_path):
        import torch

        from ..convert import torch_import

        payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = payload.get("model", payload) if isinstance(payload, dict) else payload
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if opts.name_model == "slicenet":
            return torch_import.slicenet_model(sd)
        if opts.name_model == "gtslice":
            return torch_import.gtslice_model(sd)
        if opts.name_model == "disn":
            return torch_import.disn_model(sd)
        raise ValueError(opts.name_model)

    state = restore_checkpoint(ckpt_path)
    return state["variables"] if "variables" in state else state


def _is_torch_file(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    # torch>=1.6 zip serialization starts with PK; legacy pickle with \x80
    return magic[:2] in (b"PK", b"\x80\x02", b"\x80\x04") or magic[:2] == b"PK"
