"""Drive the inference server end-to-end over HTTP (CPU backend)."""

import http.client
import io
import json
import os
import sys
import threading

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _png_bytes(size=48):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(size, size, 4), dtype=np.uint8)
    arr[..., 3] = 0
    arr[8:40, 8:40, 3] = 255  # off-center object for the recenter path
    buf = io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, "PNG")
    return buf.getvalue()


@pytest.mark.slow
def test_serve_reconstruct_http():
    sys.path.insert(0, ROOT)
    try:
        import serve
    finally:
        sys.path.remove(ROOT)
    from http.server import ThreadingHTTPServer

    from slice3d_tpu.config import Options

    opts = Options(name_model="slicenet", img_size=32, random_init=True,
                   mc_res0=8, mc_up_steps=0, mc_chunk_size=1024)
    service = serve.build_service(opts)
    service.warmup()

    server = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(service))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert resp.status == 200 and health["ok"] and health["mc_res0"] == 8

        body = _png_bytes()
        conn.request("POST", "/reconstruct", body=body)
        resp = conn.getresponse()
        obj = resp.read().decode()
        assert resp.status == 200
        stats = json.loads(resp.getheader("X-Slice3D-Stats"))
        assert stats["n_points_evaluated"] == 9 ** 3
        for line in obj.splitlines():
            assert line.startswith(("v ", "f "))

        conn.request("POST", "/reconstruct?format=json&center=0", body=body)
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 200
        assert payload["stats"]["n_points_evaluated"] == 9 ** 3
        assert isinstance(payload["obj"], str)

        conn.request("POST", "/reconstruct", body=b"not an image")
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 400

        # serving stats surfaced on /healthz (2 ok above incl. warmup=0,
        # 1 error just now)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["served"] == 2 and health["errors"] == 1
        assert health["p50_ms"] > 0
        conn.request("GET", "/nope")
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 404
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_microbatch():
    """Concurrent requests within the collection window share ONE padded
    reconstruct_batch dispatch (mc_batch_size=2)."""
    sys.path.insert(0, ROOT)
    try:
        import serve
    finally:
        sys.path.remove(ROOT)
    from slice3d_tpu.config import Options

    opts = Options(name_model="slicenet", img_size=32, random_init=True,
                   mc_res0=8, mc_up_steps=0, mc_chunk_size=1024,
                   mc_batch_size=2)
    service = serve.build_service(opts, batch_window_ms=1000.0)
    assert service.batch_size == 2

    calls = []
    orig = service.recon.reconstruct_batch

    def counted(feeds):
        calls.append(len(feeds))
        return orig(feeds)

    service.recon.reconstruct_batch = counted
    service.warmup()
    assert calls == [2]  # warmup compiles the padded batched shape

    body = _png_bytes()
    results = [None, None]

    def run(i):
        results[i] = service.reconstruct(body)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None for r in results)
    # both requests rode a single batched dispatch (padded to 2)
    assert calls == [2, 2]
    obj, stats = results[0]
    assert stats["n_points_evaluated"] == 9 ** 3
    for line in obj.splitlines():
        assert line.startswith(("v ", "f "))


@pytest.mark.slow
def test_serve_microbatch_soak():
    """12 concurrent requests through a batch-4 window: every request
    completes, and the dispatch count shows real batching (not 12 B=1
    dispatches)."""
    sys.path.insert(0, ROOT)
    try:
        import serve
    finally:
        sys.path.remove(ROOT)
    from slice3d_tpu.config import Options

    opts = Options(name_model="slicenet", img_size=32, random_init=True,
                   mc_res0=8, mc_up_steps=0, mc_chunk_size=1024,
                   mc_batch_size=4)
    service = serve.build_service(opts, batch_window_ms=250.0)
    calls = []
    orig = service.recon.reconstruct_batch

    def counted(feeds):
        calls.append(len(feeds))
        return orig(feeds)

    service.recon.reconstruct_batch = counted
    service.warmup()

    body = _png_bytes()
    n = 12
    results = [None] * n

    def run(i):
        results[i] = service.reconstruct(body)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None for r in results)
    dispatches = len(calls) - 1  # minus warmup
    assert 3 <= dispatches <= 6  # 12 requests in batch-4 dispatches
    assert service.serving_stats()["served"] == n
    for obj, stats in results:
        assert stats["n_points_evaluated"] == 9 ** 3


@pytest.mark.slow
def test_serve_points_sharded():
    """--mc_shard_axis points: the service shards each request's query
    axis over the (virtual) device mesh and still produces a mesh."""
    sys.path.insert(0, ROOT)
    try:
        import serve
    finally:
        sys.path.remove(ROOT)
    import jax

    from slice3d_tpu.config import Options

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    opts = Options(name_model="slicenet", img_size=32, random_init=True,
                   mc_res0=8, mc_up_steps=0, mc_chunk_size=1024,
                   mc_shard_axis="points")
    service = serve.build_service(opts)
    assert service.recon.mesh is not None
    assert service.recon.shard_axis == "points"
    service.warmup()
    obj, stats = service.reconstruct(_png_bytes())
    assert stats["n_points_evaluated"] == 9 ** 3
    for line in obj.splitlines():
        assert line.startswith(("v ", "f "))


@pytest.mark.slow
def test_serve_disn_feed():
    """The DISN route builds its full-projection feed (trans_mat_right +
    obj_rot_mat) — it used to KeyError at warmup."""
    sys.path.insert(0, ROOT)
    try:
        import serve
    finally:
        sys.path.remove(ROOT)
    from slice3d_tpu.config import Options

    opts = Options(name_model="disn", img_size=32, random_init=True,
                   mc_res0=8, mc_up_steps=0, mc_chunk_size=1024)
    service = serve.build_service(opts)
    service.warmup()
    obj, stats = service.reconstruct(_png_bytes())
    assert stats["n_points_evaluated"] == 9 ** 3
    for line in obj.splitlines():
        assert line.startswith(("v ", "f "))


def test_serve_rejects_gtslice():
    sys.path.insert(0, ROOT)
    try:
        import serve
    finally:
        sys.path.remove(ROOT)
    from slice3d_tpu.config import Options

    with pytest.raises(SystemExit):
        serve.build_service(Options(name_model="gtslice", random_init=True))
