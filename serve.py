#!/usr/bin/env python
"""Persistent single-image -> mesh inference server.

The batch CLIs (`reconstruct.py`) pay model build + XLA compile per
process; a serving deployment wants them paid ONCE.  This stdlib-only
server loads the model, compiles the reconstruction programs on a warmup
image, then answers requests from the resident jitted pipeline (the
reference has no serving story at all — its closest path is
create_dataset_sin_img.py + a fresh reconstruct.py run per image).

  python serve.py --name_model slicenet --name_exp exp1 --name_ckpt m.ckpt \
      --mc_res0 64 --mc_up_steps 2 --port 8080

Endpoints:
  GET  /healthz            -> {"ok": true, model/operating point info}
  POST /reconstruct        -> OBJ text (body: PNG/JPEG image; RGBA alpha
                              marks the object).  Query params:
                                center=1  alpha-bbox recenter (default 1)
                                format=json -> {"obj": ..., "stats": ...}
                              Per-request stats ride the X-Slice3D-Stats
                              header either way.

Device access is serialized with a lock (one chip, one program); the
HTTP layer is threaded so decode/preprocess overlaps device work.  With
``--mc_batch_size B`` (B > 1) concurrent requests are micro-batched:
requests arriving within ``--batch_window_ms`` of each other share one
padded B-object device dispatch (the batched pipeline of
slice3d_tpu/pipeline.py reconstruct_batch) instead of queueing behind B
serial single-object programs.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["build_service", "Slice3DService", "main"]


def _center_rgba(img):
    """Alpha-bbox recentering (same rule as create_dataset_sin_img)."""
    from PIL import Image

    alpha = img.split()[3]
    bbox = alpha.getbbox()
    if bbox is None:
        return img
    w, h = img.size
    ow, oh = bbox[2] - bbox[0], bbox[3] - bbox[1]
    off = ((w - ow) // 2 - bbox[0], (h - oh) // 2 - bbox[1])
    canvas = Image.new("RGBA", (w, h), (0, 0, 0, 0))
    canvas.paste(img, off, mask=alpha)
    return canvas


def _mesh_to_obj(mesh) -> str:
    from slice3d_tpu.mesh import obj_string

    return obj_string(mesh)


class _PendingRequest:
    __slots__ = ("feed", "event", "result", "error")

    def __init__(self, feed):
        self.feed = feed
        self.event = threading.Event()
        self.result = None
        self.error = None


class Slice3DService:
    """Model + Reconstructor resident in memory; thread-safe reconstruct.

    When the Reconstructor was built with ``mc_batch_size > 1``,
    concurrent requests are MICRO-BATCHED: the first request opens a
    collection window (``batch_window_ms``), requests arriving within it
    ride the same padded ``reconstruct_batch`` dispatch — one compiled
    shape, chip utilization of the batched pipeline instead of B serial
    B=1 dispatches.
    """

    def __init__(self, opts, recon, batch_window_ms: float = 10.0):
        self.opts = opts
        self.recon = recon
        self._lock = threading.Lock()
        from slice3d_tpu import camera

        # Identity camera (az=el=0, dist 1.2), the same convention
        # create_dataset_sin_img.py synthesizes for single-image input.
        rot, proj = camera.camera_matrices(0.0, 0.0, 1.2)
        self._rot = rot.astype(np.float32)
        self._proj = proj.astype(np.float32)
        self._full_proj = camera.full_projection_matrix(
            0.0, 0.0, 1.2).astype(np.float32)

        self.batch_size = max(1, int(getattr(recon, "batch_size", 1)))
        self.batch_window_s = float(batch_window_ms) / 1e3
        # rolling serving stats, surfaced on /healthz (own lock: request
        # threads append while /healthz probes read)
        from collections import deque

        self._stats_lock = threading.Lock()
        self._served = 0
        self._errors = 0
        self._lat = deque(maxlen=256)  # seconds, completed requests
        self._queue = None
        self._worker = None
        if self.batch_size > 1:
            import queue as _queue

            self._queue = _queue.Queue()
            self._worker = threading.Thread(target=self._batch_loop,
                                            daemon=True)
            self._worker.start()

    def warmup(self):
        img = np.zeros((self.opts.img_size, self.opts.img_size, 3), np.float32)
        feeds = [self._feed_of(img)] * self.batch_size
        if self.batch_size > 1:
            # compile the padded batched shape the worker will dispatch
            with self._lock:
                self.recon.reconstruct_batch(feeds)
        else:
            self.reconstruct_array(img)
        # Pre-compile the per-level chunk-count buckets real objects hit —
        # a bucket miss is a fresh multi-second XLA compile inside a served
        # request.  SLICE3D_WARM_KBUCKETS: comma list; empty string skips.
        spec = os.environ.get("SLICE3D_WARM_KBUCKETS", "1,2,3,4,6,8,12,16")
        if spec.strip():
            buckets = tuple(int(v) for v in spec.split(",") if v.strip())
            with self._lock:
                self.recon.warm(feeds, buckets)

    # -- micro-batching ---------------------------------------------------

    def _batch_loop(self):
        import queue as _queue
        import time as _time

        while True:
            group = [self._queue.get()]
            deadline = _time.monotonic() + self.batch_window_s
            while len(group) < self.batch_size:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self._queue.get(timeout=remaining))
                except _queue.Empty:
                    break
            feeds = [p.feed for p in group]
            # pad the tail so the compiled batch shape stays fixed
            feeds = feeds + [feeds[-1]] * (self.batch_size - len(feeds))
            try:
                with self._lock:
                    results = self.recon.reconstruct_batch(feeds)
            except Exception as e:  # surface to every waiter, keep serving
                for p in group:
                    p.error = e
                    p.event.set()
                continue
            for p, (mesh, stats) in zip(group, results):
                p.result = (mesh, stats)
                p.event.set()

    def preprocess(self, img_bytes: bytes, center: bool = True) -> np.ndarray:
        from PIL import Image

        from slice3d_tpu.data.dataset import preprocess_image

        img = Image.open(io.BytesIO(img_bytes))
        if img.mode == "RGBA" and center:
            img = _center_rgba(img)
        return preprocess_image(img, self.opts.img_size,
                                self.opts.use_white_bg)

    def _feed_of(self, img: np.ndarray):
        feed = {"img_input": img.astype(np.float32)}
        if self.opts.name_model == "disn":
            # DISN projects canonical points with the full camera matrix
            feed["trans_mat_right"] = self._full_proj
            feed["obj_rot_mat"] = self._rot
        else:
            feed["trans_mat_wo_rot_tp"] = self._proj
        return feed

    def reconstruct_array(self, img: np.ndarray):
        feed = self._feed_of(img)
        if self._queue is not None:
            pending = _PendingRequest(feed)
            self._queue.put(pending)
            pending.event.wait()
            if pending.error is not None:
                raise pending.error
            return pending.result
        with self._lock:
            return self.recon.reconstruct(feed)

    def reconstruct(self, img_bytes: bytes, center: bool = True):
        import time

        t0 = time.perf_counter()
        try:
            mesh, stats = self.reconstruct_array(
                self.preprocess(img_bytes, center))
        except Exception:
            with self._stats_lock:
                self._errors += 1
            raise
        with self._stats_lock:
            self._lat.append(time.perf_counter() - t0)
            self._served += 1
        return _mesh_to_obj(mesh), {
            k: v for k, v in stats.items()
            if isinstance(v, (int, float, np.integer, np.floating))
        }

    def serving_stats(self):
        with self._stats_lock:
            lat = sorted(self._lat)
            served, errors = self._served, self._errors

        def pct(p):
            return round(lat[min(int(p * len(lat)), len(lat) - 1)] * 1e3, 1)

        out = {"served": served, "errors": errors}
        if lat:
            out.update(p50_ms=pct(0.5), p90_ms=pct(0.9))
        return out


def build_service(opts, batch_window_ms: float = 10.0) -> Slice3DService:
    if opts.name_model not in ("slicenet", "disn"):
        raise SystemExit(
            "serve.py needs a single-image model (slicenet or disn); the "
            "gtslice/LDM route requires slice images per request")
    from slice3d_tpu.models.build import build_model, load_model_variables
    from slice3d_tpu.pipeline import Reconstructor

    model = build_model(opts)
    ckpt_path = None
    if opts.name_ckpt:
        import os

        ckpt_path = os.path.join(opts.exp_dir, "ckpt", opts.name_ckpt)
    variables = load_model_variables(model, opts, ckpt_path)

    # multi-chip host: shard each request's query-point axis (latency,
    # --mc_shard_axis points) or the micro-batch (throughput) over the mesh
    import jax

    from slice3d_tpu.parallel import reconstruction_mesh

    mesh = reconstruction_mesh(opts.mc_shard_axis, opts.mc_batch_size,
                               opts.mc_chunk_size, len(jax.devices()))

    recon = Reconstructor(
        model, variables,
        resolution0=opts.mc_res0,
        upsampling_steps=opts.mc_up_steps,
        threshold=opts.mc_threshold,
        chunk_size=opts.mc_chunk_size,
        simplify_nfaces=opts.simplify_nfaces,
        refine_steps=opts.mc_refine_steps,
        extract_method=opts.mc_extract,
        batch_size=opts.mc_batch_size,
        mesh=mesh,
        shard_axis=opts.mc_shard_axis,
    )
    return Slice3DService(opts, recon, batch_window_ms=batch_window_ms)


def make_handler(service: Slice3DService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code, body: bytes, ctype: str, extra=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._send(404, b"not found", "text/plain")
            o = service.opts
            info = {"ok": True, "model": o.name_model,
                    "img_size": o.img_size, "mc_res0": o.mc_res0,
                    "mc_up_steps": o.mc_up_steps,
                    "batch_size": service.batch_size,
                    "batch_window_ms": service.batch_window_s * 1e3,
                    **service.serving_stats()}
            self._send(200, json.dumps(info).encode(), "application/json")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/reconstruct":
                return self._send(404, b"not found", "text/plain")
            q = parse_qs(url.query)
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                obj, stats = service.reconstruct(
                    body, center=q.get("center", ["1"])[0] != "0")
            except Exception as e:  # bad image, wrong mode, ...
                return self._send(400, str(e).encode(), "text/plain")
            hdr = {"X-Slice3D-Stats": json.dumps(stats)}
            if q.get("format", [""])[0] == "json":
                payload = json.dumps({"obj": obj, "stats": stats}).encode()
                return self._send(200, payload, "application/json", hdr)
            self._send(200, obj.encode(), "text/plain", hdr)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--batch_window_ms", type=float, default=10.0,
                        help="micro-batch collection window when "
                             "--mc_batch_size > 1")
    srv_args, rest = parser.parse_known_args(argv)

    from slice3d_tpu.config import options_from_args
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    opts = options_from_args(rest)
    service = build_service(opts, batch_window_ms=srv_args.batch_window_ms)
    print("compiling warmup reconstruction ...", flush=True)
    service.warmup()

    server = ThreadingHTTPServer((srv_args.host, srv_args.port),
                                 make_handler(service))
    print(f"serving {opts.name_model} on http://{srv_args.host}:"
          f"{server.server_address[1]}  (res0 {opts.mc_res0}, "
          f"up {opts.mc_up_steps})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
        server.server_close()


if __name__ == "__main__":
    main()
