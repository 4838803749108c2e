"""Cross-host (DCN) scaling: 2 jax.distributed processes, one global mesh.

SURVEY §2.5's last axis: multi-pod scaling rides jax.distributed — after
``init_distributed`` every process sees the GLOBAL device list, so
``create_mesh`` + ``put_batch`` + the jitted step are the same code as
single-host; XLA routes the collectives across hosts.  This test forms a
2-process x 4-device cluster (Gloo collectives on CPU), runs two FSDP-
style update steps with each process feeding its LOCAL batch shard, and
pins the result against the same math computed un-sharded.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys
pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from slice3d_tpu.parallel import (create_mesh, init_distributed, put_batch,
                                  shard_params_fsdp)
n = init_distributed(coordinator=f"127.0.0.1:{{port}}", num_processes=nproc,
                     process_id=pid)
assert n == nproc and len(jax.devices()) == 8, (n, len(jax.devices()))
import jax.numpy as jnp
import numpy as np
mesh = create_mesh((4, 2))  # data 4 x model 2, spanning both processes

w0 = jax.random.normal(jax.random.PRNGKey(0), (64, 64), jnp.float32) * 0.1
w, _ = shard_params_fsdp({{"w": w0}}, mesh, min_size=1)

def step(params, x):
    def loss_fn(p):
        y = x @ p["w"]
        return jnp.mean(y * y)
    loss, g = jax.value_and_grad(loss_fn)(params)
    return jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params, g), loss

jstep = jax.jit(step)
rng = np.random.default_rng(0)
xg = rng.normal(size=(8, 64)).astype(np.float32)  # GLOBAL batch
local = xg[pid * 4:(pid + 1) * 4]                 # this host's loader shard
batch = put_batch({{"x": local}}, mesh)
params = w
for _ in range(2):
    params, loss = jstep(params, batch["x"])
final = float(loss)
if pid == 0:
    with open(outfile, "w") as f:
        json.dump({{"loss": final}}, f)
print(f"[rank {{pid}}] loss {{final}}", flush=True)
"""


@pytest.mark.slow
def test_two_process_dcn_training_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(root=ROOT))
    out = tmp_path / "out.json"

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode())
        assert p.returncode == 0, stdout.decode()[-2000:]

    measured = json.load(open(out))["loss"]

    # same math, un-sharded, single process
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 64), jnp.float32) * 0.1
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64)),
                    jnp.float32)
    params = {"w": w}
    for _ in range(2):
        def loss_fn(p):
            y = x @ p["w"]
            return jnp.mean(y * y)
        loss, g = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p_, g_: p_ - 0.1 * g_,
                                        params, g)
    assert abs(measured - float(loss)) < 1e-5, (measured, float(loss), logs)
