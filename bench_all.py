#!/usr/bin/env python
"""Benchmark harness for ALL BASELINE.json configs (1-5) + training (6-7).

Prints one JSON line per config.  ``bench.py`` stays the driver's single
headline metric (config 1); this harness is the ledger source for
BASELINE.md's measured table.

Configs (BASELINE.md):
  1. single RGBA -> SliceNet -> SDF grid -> mesh      [p50 seconds]
     (BENCH1_UP_STEPS selects the 65^3 headline vs 257^3 full-quality point)
  2. test-split regression reconstruction, batched    [objects/min]
  3. gtslice reconstruction from 12 slice images      [objects/min]
  4. kl-f8 VAE 13-image encode+decode                 [stacks/s]
  5. LDM DDIM-200 slice generation + gtslice -> mesh  [p50 s/object]
  6. SliceNet regression TRAINING step                [steps/s, samples/s]
  7. LDM TRAINING step (frozen VAE + cond + UNet)     [steps/s, samples/s]

Weights are random-init (no pretrained ckpts ship with the reference
either); all numbers are pure-throughput operating points.
"""

import json
import os
import time

import numpy as np

ENV = os.environ.get


def _twin_baseline():
    """Measured reference baseline (tools/bench_reference_twin.py output,
    recorded in BASELINE_TWIN.json): the torch twin of the reference's
    per-3000pt-chunk full-network recompute hot loop, measured on this
    host's CPU — the only reference hardware available here (the reference
    repo/paper publish no A100 throughput we can verify)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_TWIN.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _vs_twin_opm(objects_per_min):
    twin = _twin_baseline()
    if not twin:
        return None, None
    ratio = objects_per_min / twin["ref_twin_est_objects_per_min"]
    return round(ratio, 1), twin["baseline_source"]


V5E_BF16_PEAK = 197e12


def _train_step_flops(cfg):
    """Analytic FLOPs of the config-6/7 train step via XLA's cost model.

    Runs tools/train_flops.py in a SUBPROCESS (CPU lowering only): the
    axon remote-compile path returns a stub cost analysis, so the parent
    process holding the TPU backend cannot lower-and-count in-process.
    Skippable via BENCH_SKIP_MFU=1 (the lowering costs ~1-2 min/config on
    this 1-core host)."""
    if ENV("BENCH_SKIP_MFU"):
        return None
    import subprocess
    import sys
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "train_flops.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "TPU"))}
    try:
        out = subprocess.run([sys.executable, tool, str(cfg)], env=env,
                             capture_output=True, text=True, timeout=900)
        return float(json.loads(out.stdout.strip().splitlines()[-1])
                     ["flops_per_step"])
    except Exception:
        return None


def _median(f, repeats, warmup=1):
    for _ in range(warmup):
        f()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _slicenet_recon(res0, up_steps, chunk, batch=1):
    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables
    from slice3d_tpu.pipeline import Reconstructor

    opts = Options(name_model="slicenet", img_size=128, dtype="bfloat16",
                   random_init=True)
    model = build_model(opts)
    variables = init_variables(model, opts)
    return Reconstructor(model, variables, resolution0=res0,
                         upsampling_steps=up_steps, threshold=0.5,
                         chunk_size=chunk, batch_size=batch)


def _gtslice_recon(res0, up_steps, chunk, batch=1):
    from slice3d_tpu.config import Options
    from slice3d_tpu.models.build import build_model, init_variables
    from slice3d_tpu.pipeline import Reconstructor

    opts = Options(name_model="gtslice", img_size=128, dtype="bfloat16",
                   random_init=True)
    model = build_model(opts)
    variables = init_variables(model, opts)
    return Reconstructor(model, variables, resolution0=res0,
                         upsampling_steps=up_steps, threshold=0.5,
                         chunk_size=chunk, batch_size=batch)


def _feeds(n, with_slices):
    from slice3d_tpu import camera

    rng = np.random.default_rng(0)
    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)
    feeds = []
    for _ in range(n):
        f = {"trans_mat_wo_rot_tp": proj.astype(np.float32)}
        if with_slices:
            f["img_slices"] = rng.normal(size=(12, 128, 128, 3)).astype(np.float32)
        else:
            f["img_input"] = rng.normal(size=(128, 128, 3)).astype(np.float32)
        feeds.append(f)
    return feeds


def config1():
    res0 = int(ENV("BENCH1_RES0", "64"))
    up = int(ENV("BENCH1_UP_STEPS", "2"))
    chunk = int(ENV("BENCH_CHUNK", "32768"))
    recon = _slicenet_recon(res0, up, chunk)
    feeds = _feeds(1 + int(ENV("BENCH_REPEATS", "5")), with_slices=False)
    recon.reconstruct(feeds[0])  # compile
    ts = []
    for f in feeds[1:]:
        t0 = time.perf_counter()
        recon.reconstruct(f)
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    out = {"config": 1, "metric": "single_image_to_mesh_p50_s",
           "operating_point": f"res0={res0},up={up}",
           "value": round(p50, 4), "unit": "s",
           "vs_baseline": round(2.0 / p50, 4)}
    twin = _twin_baseline()
    if twin:
        out["vs_ref_twin_same_op_point"] = round(
            twin["ref_twin_est_s_per_object"] / p50, 1)
        out["ref_twin_source"] = twin["baseline_source"]
    return out


def _warm_link():
    """Pull a ~1 MB probe until the tunnel's d2h path is healthy (the
    axon link stalls transiently — see bench.py / BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda x: x * 1.0)(jnp.zeros((512, 512), jnp.float32))
    fast = 0
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(probe)
        fast = fast + 1 if time.perf_counter() - t0 < 0.25 else 0
        if fast >= 2:
            break


def _objects_per_min(recon, feeds, batch=1):
    marks = []
    # warm over the FULL feed set: each batch's refined point count can
    # hit a different chunk-count specialization, and a compile inside
    # the timed pass would pollute the steady-state number
    recon.reconstruct_all(iter(feeds), lambda *a: None)
    _warm_link()
    t0 = time.perf_counter()
    recon.reconstruct_all(iter(feeds),
                          lambda j, m, s: marks.append(time.perf_counter()))
    dt = time.perf_counter() - t0
    # stall-aware throughput: completion gaps caught in a tunnel stall
    # window measure the link, not the pipeline — censor gaps > 3x the
    # median and report the healthy-link rate alongside.  Gaps are taken
    # at BATCH granularity: a batch's objects complete together, so the
    # per-object deltas inside a batch are ~0 and would poison the median
    ends = marks[batch - 1::batch]
    if marks[-1] not in ends:
        ends.append(marks[-1])  # final partial batch
    counts = np.diff([0] + [min((i + 1) * batch, len(marks))
                            for i in range(len(ends))])
    deltas = np.diff([t0] + ends)
    med = float(np.median(deltas))
    keep = deltas <= 3.0 * med
    healthy = (float(counts[keep].sum()) / float(deltas[keep].sum()) * 60.0
               if keep.any() and deltas[keep].sum() > 0 else None)
    return (len(marks) / dt * 60.0, dt, healthy, int((~keep).sum()))


def config2():
    n = int(ENV("BENCH2_OBJECTS", "32"))
    res0 = int(ENV("BENCH2_RES0", "64"))
    up = int(ENV("BENCH2_UP_STEPS", "1"))  # 128^3 effective
    batch = int(ENV("BENCH2_BATCH", "8"))
    recon = _slicenet_recon(res0, up, int(ENV("BENCH_CHUNK", "8192")),
                            batch=batch)
    opm, dt, healthy, n_stalls = _objects_per_min(
        recon, _feeds(n, with_slices=False), batch=batch)
    vs, src = _vs_twin_opm(opm)
    return {"config": 2, "metric": "regression_recon_objects_per_min",
            "operating_point": f"res0={res0},up={up},n={n},batch={batch}",
            "value": round(opm, 2), "unit": "objects/min",
            "healthy_link_objects_per_min":
                round(healthy, 2) if healthy else None,
            "n_link_stall_gaps": n_stalls,
            "vs_baseline": vs, "baseline_source": src,
            "wall_s": round(dt, 2)}


def config3():
    n = int(ENV("BENCH3_OBJECTS", "32"))
    res0 = int(ENV("BENCH3_RES0", "64"))
    up = int(ENV("BENCH3_UP_STEPS", "2"))  # reference full-quality point
    # batch 1 default: at up=2 this host's single CPU core makes the
    # native refine+march stage the bottleneck, and batch 1 maximizes
    # host/device overlap (see BASELINE.md round-3 layout study); it also
    # rides the fused-levels single-dispatch path
    batch = int(ENV("BENCH3_BATCH", "1"))
    recon = _gtslice_recon(res0, up, int(ENV("BENCH_CHUNK", "8192")),
                           batch=batch)
    opm, dt, healthy, n_stalls = _objects_per_min(
        recon, _feeds(n, with_slices=True), batch=batch)
    vs, src = _vs_twin_opm(opm)
    return {"config": 3, "metric": "gtslice_recon_objects_per_min",
            "operating_point": f"res0={res0},up={up},n={n},batch={batch}",
            "value": round(opm, 2), "unit": "objects/min",
            "healthy_link_objects_per_min":
                round(healthy, 2) if healthy else None,
            "n_link_stall_gaps": n_stalls,
            "vs_baseline": vs, "baseline_source": src,
            "wall_s": round(dt, 2)}


def config4():
    import jax
    import jax.numpy as jnp

    from slice3d_tpu.diffusion.latent import LatentDiffusion

    bs = int(ENV("BENCH4_BS", "8"))
    module = LatentDiffusion(latent_size=16, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((bs, 13, 128, 128, 3), jnp.float32)

    def init_fn(m):
        z = m.encode_images(imgs[:1], jax.random.PRNGKey(0))
        m.decode_tiles(z[:, :1])
        return z

    import flax.linen as nn

    variables = nn.init(init_fn, module)({"params": rng})

    @jax.jit
    def roundtrip(v, x, key):
        z = module.apply(v, x, key, True, method=LatentDiffusion.encode_images)
        out = module.apply(v, z, method=LatentDiffusion.decode_tiles)
        # checksum: forces a host fetch per run — block_until_ready alone
        # does not synchronize through the axon tunnel
        return jnp.sum(out.astype(jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(bs, 13, 128, 128, 3)).astype(np.float32))

    def run():
        float(roundtrip(variables, x, rng))

    t = _median(run, int(ENV("BENCH_REPEATS", "5")))
    return {"config": 4, "metric": "vae_13img_roundtrip_stacks_per_s",
            "operating_point": f"bs={bs},128px",
            "value": round(bs / t, 3), "unit": "stacks/s",
            "vs_baseline": None, "batch_latency_s": round(t, 4)}


def config5():
    import jax

    from slice3d_tpu.diffusion.latent import LatentDiffusion
    from slice3d_tpu.train.train_ldm import LDMTrainer

    bs = int(ENV("BENCH5_BS", "8"))
    steps = int(ENV("BENCH5_DDIM_STEPS", "200"))
    sampler = ENV("BENCH5_SAMPLER", "ddim")  # dpm: ~10x fewer steps
    import jax.numpy as jnp

    module = LatentDiffusion(latent_size=16, dtype=jnp.bfloat16)
    trainer = LDMTrainer(img_size=128, batch_size=bs, module=module,
                         scale_by_std=False, use_ema=False)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(bs, 13, 128, 128, 3)).astype(np.float32),
        "img_ipt_view": rng.normal(size=(bs, 128, 128, 3)).astype(np.float32),
    }

    def sample():
        return trainer.sample_slices(state, batch, ddim_steps=steps, eta=1.0,
                                     rng=jax.random.PRNGKey(1), use_ema=False,
                                     sampler=sampler)

    slices = sample()  # compile + slices for stage 2
    t_gen = _median(sample, max(int(ENV("BENCH_REPEATS", "5")) - 2, 1))

    # batch 1 at up=2: same rationale as config 3 (round-3 layout study —
    # the full-quality point is host-bound on this 1-core host and batch 1
    # maximizes host/device overlap; measured 140 vs ~60 obj/min at B=8)
    recon = _gtslice_recon(int(ENV("BENCH5_RES0", "64")),
                           int(ENV("BENCH5_UP_STEPS", "2")),
                           int(ENV("BENCH_CHUNK", "8192")),
                           batch=int(ENV("BENCH5_BATCH", "1")))
    from slice3d_tpu import camera

    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)
    feeds = [{"img_slices": np.asarray(slices[i], np.float32),
              "trans_mat_wo_rot_tp": proj.astype(np.float32)}
             for i in range(bs)]
    opm, dt, _healthy, _n_stalls = _objects_per_min(recon, feeds)
    per_obj = t_gen / bs + dt / bs
    return {"config": 5, "metric": "generation_e2e_s_per_object",
            "operating_point": f"{sampler}={steps},bs={bs},res0=64,up=2",
            "value": round(per_obj, 3), "unit": "s/object",
            "vs_baseline": None,
            "ddim_batch_s": round(t_gen, 3), "recon_s": round(dt, 3)}


def _timed_steps(step_once, n_steps, warmup=2):
    """Wall-time ``n_steps`` state-threading train steps after warmup.

    ``step_once(sync)`` must force a host fetch of a scalar when sync is
    True (block_until_ready does not synchronize through the axon
    tunnel).  Steps are queued without syncing and fetched ONCE at the
    end: state threads step->step on device, so the final fetch bounds
    all of them — that is the device's steady-state throughput, not the
    tunnel's per-pull latency (a real train loop fetches logs every
    freq_log steps, not every step).
    """
    for _ in range(warmup):
        step_once(sync=True)
    t0 = time.perf_counter()
    for i in range(n_steps):
        step_once(sync=(i == n_steps - 1))
    return time.perf_counter() - t0


def _device_batch(batch, mesh):
    """Pre-put the bench batch on device ONCE (device_put on an already
    correctly-sharded jax.Array is a no-op, so the trainer's internal
    put_batch stops re-uploading).

    The round-4 config-6/7 numbers re-uploaded the SAME host batch every
    step through the tunnel (~50 MB/s): config 6's 41 MB batch alone is
    ~0.9 s of its 1.26 s step — those rows measured the tunnel's h2d, not
    the chip.  A real train loop prefetches/overlaps h2d (BatchLoader),
    and on a directly-attached host the transfer is sub-ms; steady-state
    device throughput is the number MFU is defined over.  The one-time
    h2d cost is measured and reported alongside as ``h2d_batch_s``.
    """
    import jax

    from slice3d_tpu.parallel import put_batch

    t0 = time.perf_counter()
    dev = put_batch(batch, mesh)
    # sync the transfers with a full pull of the SMALLEST leaf (a direct
    # d2h, no compiled program; slicing would compile one tiny program
    # per leaf shape, which costs ~30 s/shape through the tunnel)
    smallest = min(jax.tree_util.tree_leaves(dev), key=lambda x: x.size)
    np.asarray(smallest)
    h2d_s = time.perf_counter() - t0
    return dev, round(h2d_s, 4)


def config6():
    """Regression TRAINING throughput (reference operating point:
    bs 16, 128^2 images, 256 query points, Adam 3e-4, full 3-term loss
    incl. the 0.001x VGG19 perceptual term — reg_slices/options.py:26-28,
    train.py:41-53)."""
    import jax

    from slice3d_tpu.config import Options
    from slice3d_tpu.models.vgg import VGG19Features
    from slice3d_tpu.train.train_reg import RegressionTrainer

    bs = int(ENV("BENCH6_BS", "16"))
    n_qry = int(ENV("BENCH6_QRY", "256"))
    n_steps = int(ENV("BENCH6_STEPS", "10"))
    img = int(ENV("BENCH6_IMG", "128"))
    # bf16 mixed precision is the TPU-first training point (fp32 master
    # weights + fp32 loss; see Options.train_dtype).  BENCH6_DTYPE=float32
    # measures the reference's exact torch numerics.
    tdtype = ENV("BENCH6_DTYPE", "bfloat16")
    opts = Options(name_model="slicenet", img_size=img, n_qry=n_qry, n_bs=bs,
                   train_dtype=tdtype)
    vgg19 = VGG19Features().init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    trainer = RegressionTrainer(opts, vgg19_params=vgg19)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    batch = {
        "img_input": rng.normal(size=(bs, img, img, 3)).astype(np.float32),
        "img_slices": rng.normal(size=(bs, 12, img, img, 3)).astype(np.float32),
        "qry_norot": rng.uniform(-0.5, 0.5, (bs, n_qry, 3)).astype(np.float32),
        "sdf": (rng.normal(size=(bs, n_qry)) * 0.1).astype(np.float32),
        "occ": (rng.random((bs, n_qry)) > 0.5).astype(np.float32),
        "obj_rot_mat": np.broadcast_to(
            np.eye(3, dtype=np.float32), (bs, 3, 3)).copy(),
        "trans_mat_wo_rot_tp": np.broadcast_to(
            np.eye(4, 3, dtype=np.float32), (bs, 4, 3)).copy(),
    }

    batch, h2d_s = _device_batch(batch, trainer.mesh)
    box = {"state": state}

    def step_once(sync=True):
        box["state"], logs = trainer.train_step(box["state"], batch)
        return float(logs["loss"]) if sync else None

    dt = _timed_steps(step_once, n_steps)
    sps = n_steps / dt

    # input-pipeline saturation: can BatchLoader feed batches faster than
    # the device consumes them?  Measured over a synthetic on-disk dataset
    # at the same operating point; fraction < 1 means the loader keeps up.
    loader_frac = None
    if not ENV("BENCH6_SKIP_LOADER"):
        import shutil
        import tempfile

        from slice3d_tpu.data.builders import create_synthetic_dataset
        from slice3d_tpu.data.dataset import Slice3DDataset
        from slice3d_tpu.data.pipeline import BatchLoader

        tmp = tempfile.mkdtemp(prefix="bench6_ds_")
        try:
            create_synthetic_dataset(os.path.join(tmp, "objaverse"),
                                     n_shapes=2 * bs, n_views=12,
                                     img_size=img, n_sdf=4096)
            ds = Slice3DDataset(os.path.join(tmp, "objaverse"),
                                split="train", img_size=img, n_qry=n_qry)
            loader = BatchLoader(ds, bs, num_workers=int(ENV("BENCH6_WK", "4")))
            it = iter(loader)
            next(it)  # warm the prefetch pipeline
            t0 = time.perf_counter()
            n_b = 0
            for _ in it:
                n_b += 1
            t_batch = (time.perf_counter() - t0) / max(n_b, 1)
            loader_frac = round(t_batch / (dt / n_steps), 3)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    flops = _train_step_flops(6)
    return {"config": 6, "metric": "regression_train_steps_per_s",
            "operating_point": f"bs={bs},qry={n_qry},img={img},{tdtype},3-term loss",
            "value": round(sps, 3), "unit": "steps/s",
            "vs_baseline": None,
            "samples_per_s": round(sps * bs, 2),
            "step_latency_s": round(dt / n_steps, 4),
            "train_step_tflops": round(flops / 1e12, 2) if flops else None,
            "train_mfu_bf16": round(flops * sps / V5E_BF16_PEAK, 4)
            if flops else None,
            "batch_residency": "device (h2d prefetched; see _device_batch)",
            "h2d_batch_s": h2d_s,
            "input_pipeline_fraction": loader_frac}


def config7():
    """LDM TRAINING throughput (reference operating point: bs 8, 128^2
    39-ch stacks, frozen kl-f8 VAE encode + trainable cond stage + UNet
    eps-loss — configs/latent-diffusion/objaverse-ldm-kl-8.yaml:2-34)."""
    import jax
    import jax.numpy as jnp

    from slice3d_tpu.diffusion.latent import LatentDiffusion
    from slice3d_tpu.train.train_ldm import LDMTrainer

    bs = int(ENV("BENCH7_BS", "8"))
    n_steps = int(ENV("BENCH7_STEPS", "10"))
    img = 128
    if ENV("BENCH7_TINY"):  # CPU smoke only — NOT a reportable point
        img = 16
        module = LatentDiffusion(
            timesteps=20, vae_ch=32, vae_mult=(1, 2), vae_nres=1,
            unet_channels=32, unet_mult=(1, 2), unet_nres=1,
            unet_attention_ds=(2,), unet_inject_blocks=(0, 3),
            cond_widths=(32, 64), latent_size=img // 2,
            dtype=jnp.bfloat16)
    else:
        module = LatentDiffusion(latent_size=16, dtype=jnp.bfloat16)
    tkw = {"timesteps": 20} if ENV("BENCH7_TINY") else {}
    trainer = LDMTrainer(img_size=img, batch_size=bs, module=module,
                         scale_by_std=False, use_ema=True, **tkw)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(bs, 13, img, img, 3)).astype(np.float32),
        "img_ipt_view": rng.normal(size=(bs, img, img, 3)).astype(np.float32),
    }

    batch, h2d_s = _device_batch(batch, trainer.mesh)
    box = {"state": trainer.init_state(), "i": 0}

    def step_once(sync=True):
        key = jax.random.PRNGKey(box["i"])
        box["i"] += 1
        box["state"], logs = trainer.train_step(box["state"], batch, key)
        return float(logs["loss_simple"]) if sync else None

    dt = _timed_steps(step_once, n_steps)
    sps = n_steps / dt
    flops = None if ENV("BENCH7_TINY") else _train_step_flops(7)
    return {"config": 7, "metric": "ldm_train_steps_per_s",
            "operating_point": f"bs={bs},{img}px,ema=on",
            "value": round(sps, 3), "unit": "steps/s",
            "vs_baseline": None,
            "samples_per_s": round(sps * bs, 2),
            "step_latency_s": round(dt / n_steps, 4),
            "train_step_tflops": round(flops / 1e12, 2) if flops else None,
            "train_mfu_bf16": round(flops * sps / V5E_BF16_PEAK, 4)
            if flops else None,
            "batch_residency": "device (h2d prefetched; see _device_batch)",
            "h2d_batch_s": h2d_s}


def config8():
    """SERVING under concurrent load (serve.py over HTTP on this chip):
    req/s + latency percentiles, B=1 vs micro-batched.  The reference has
    no serving story at all; the row exists so micro-batching claims are
    measured, not extrapolated from config 2."""
    import io
    import json as _json
    from concurrent.futures import ThreadPoolExecutor
    from http.client import HTTPConnection
    from http.server import ThreadingHTTPServer
    from threading import Thread

    from PIL import Image

    import serve
    from slice3d_tpu.config import Options

    res0 = int(ENV("BENCH8_RES0", "64"))
    up = int(ENV("BENCH8_UP_STEPS", "2"))
    n_req = int(ENV("BENCH8_REQUESTS", "16"))
    n_cc = int(ENV("BENCH8_CONCURRENCY", "8"))
    bsz = int(ENV("BENCH8_BATCH", "4"))
    window = float(ENV("BENCH8_WINDOW_MS", "80"))

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 255, (128, 128, 4), dtype=np.uint8), "RGBA"
    ).save(buf, format="PNG")
    png = buf.getvalue()

    def drive(batch_size):
        opts = Options(name_model="slicenet", img_size=128, dtype="bfloat16",
                       random_init=True, mc_res0=res0, mc_up_steps=up,
                       mc_chunk_size=int(ENV("BENCH_CHUNK", "32768")),
                       mc_batch_size=batch_size)
        service = serve.build_service(opts, batch_window_ms=window)
        service.warmup()
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     serve.make_handler(service))
        Thread(target=server.serve_forever, daemon=True).start()
        port = server.server_address[1]

        def one(_):
            conn = HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/reconstruct", body=png,
                         headers={"Content-Type": "image/png"})
            r = conn.getresponse()
            ok = r.status == 200
            r.read()
            conn.close()
            return ok

        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_cc) as pool:
            oks = list(pool.map(one, range(n_req)))
        wall = time.perf_counter() - t0
        stats = service.serving_stats()
        server.shutdown()
        return {"req_per_s": round(n_req / wall, 3),
                "wall_s": round(wall, 2),
                "ok": int(sum(oks)),
                "p50_ms": stats.get("p50_ms"), "p90_ms": stats.get("p90_ms")}

    single = drive(1)
    batched = drive(bsz)
    return {"config": 8, "metric": "serving_req_per_s",
            "operating_point": f"res0={res0},up={up},cc={n_cc},n={n_req}",
            "value": batched["req_per_s"], "unit": "req/s",
            "vs_baseline": None,
            "single": single, f"microbatch_b{bsz}_w{window:g}ms": batched,
            "microbatch_speedup": round(
                batched["req_per_s"] / single["req_per_s"], 2)}


def main():
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    only = ENV("BENCH_CONFIGS", "1,2,3,4,5,6,7,8")
    fns = {"1": config1, "2": config2, "3": config3, "4": config4,
           "5": config5, "6": config6, "7": config7, "8": config8}
    for key in only.split(","):
        key = key.strip()
        if key in fns:
            print(json.dumps(fns[key]()), flush=True)


if __name__ == "__main__":
    main()
