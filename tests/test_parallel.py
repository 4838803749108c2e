"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from slice3d_tpu.parallel import (
    batch_sharding,
    create_mesh,
    shard_params_fsdp,
    put_batch,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh((2, 4))
    assert mesh2.shape == {"data": 2, "model": 4}


def test_fsdp_sharding_rules():
    mesh = create_mesh((2, 4))
    params = {
        "big": np.zeros((128, 512), np.float32),
        "small": np.zeros((4,), np.float32),
        "odd": np.zeros((333, 7), np.float32),
    }
    sharded, specs = shard_params_fsdp(params, mesh, min_size=1024)
    assert specs["big"].spec == P(None, "model")
    assert specs["small"].spec == P()
    # 333 and 7 are both indivisible by 4 -> replicated
    assert specs["odd"].spec == P()
    np.testing.assert_array_equal(np.asarray(sharded["big"]), params["big"])


def test_sharded_batch_matmul_matches_single_device():
    mesh = create_mesh((8, 1))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    w = rng.normal(size=(32, 8)).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda a, b: a @ b)(xs, w)
    np.testing.assert_allclose(np.asarray(out), x @ w, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    # The driver calls this with virtual CPU devices; run it in-process.
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
