"""System-level (mesh-level) same-weights parity vs a torch execution of
the reference reconstruction chain.

The module twins pin layers to 5e-4, but the *glue* — the projection feed,
the -sdf pseudo-logit (reference reconstruct.py:97), the test-mode y/z
flip (models.py:53-56), the probability->logit threshold math, and the
vertex normalization (reconstruct.py:189-208) — could still drift without
any module test failing.  Here ONE weight set drives both frameworks
end-to-end: the torch twin replays the reference's chunked lattice
evaluation (reconstruct.py:121-173: eval_points over 3000-pt chunks ->
dense value grid), the repo runs ``Reconstructor``; the dense grids must
agree and the extracted meshes must be Chamfer-close.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TorchGTSliceRef, randomize_bn_stats  # noqa: E402
from slice3d_tpu import camera  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402
from slice3d_tpu.models.gtslice import GTSliceModel  # noqa: E402
from slice3d_tpu.pipeline import Reconstructor  # noqa: E402

N_SLICES = 12
HW = 32
RES0 = 16
# the random-weights pseudo-logit field spans ~[0.24, 0.82]; a probability
# threshold of sigmoid(0.5) puts the iso-surface mid-field so a REAL
# surface (not just the padding box) is extracted
THRESHOLD = 0.6225


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(21)
    tmodel = randomize_bn_stats(TorchGTSliceRef(N_SLICES), seed=2).eval()
    rng = np.random.default_rng(9)
    slices = rng.normal(size=(N_SLICES, HW, HW, 3)).astype(np.float32) * 0.5
    _, proj = camera.camera_matrices(0.0, 0.0, 1.2)
    return tmodel, slices, proj.astype(np.float32)


def torch_value_grid(tmodel, slices, proj, res, chunk=3000):
    """Reference chain: lattice points -> test-mode flip -> chunked model
    eval -> NEGATED sdf as pseudo-logits -> dense (res+1)^3 grid
    (reconstruct.py:74-102,148-167)."""
    n = res + 1
    axis = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    pts = (pts / res - 0.5).astype(np.float32)  # box_size = 1

    t_slices = torch.from_numpy(slices[None]).permute(0, 1, 4, 2, 3)
    t_proj = torch.from_numpy(proj[None])
    flip = np.array([1.0, -1.0, -1.0], np.float32)

    vals = []
    with torch.no_grad():
        for i in range(0, len(pts), chunk):
            q = (pts[i:i + chunk] * flip)[None]
            sdf = tmodel(t_slices, torch.from_numpy(q), t_proj)
            vals.append(-sdf[0].numpy())  # pseudo-logit (reconstruct.py:97)
    return np.concatenate(vals).reshape(n, n, n)


@pytest.mark.slow
def test_dense_grid_parity(twin):
    """up_steps=0: the full coarse lattice is evaluated on both sides —
    the grids must agree to module-parity tolerance."""
    tmodel, slices, proj = twin
    variables = torch_import.gtslice_model(tmodel.state_dict())
    model = GTSliceModel(n_slices=N_SLICES)
    recon = Reconstructor(model, variables, resolution0=RES0,
                          upsampling_steps=0, threshold=THRESHOLD,
                          chunk_size=1024, transport_dtype="float32")
    feed = {"img_slices": slices, "trans_mat_wo_rot_tp": proj}
    grid, _, _ = recon._build_grid(feed)

    t_grid = torch_value_grid(tmodel, slices, proj, RES0)
    np.testing.assert_allclose(grid, t_grid, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_mesh_parity_refined(twin):
    """up_steps=1: torch replays the same coarse->fine refinement schedule
    through its own chunked full-network evaluation (the reference's
    eval_points contract); the final refined grids and the extracted
    meshes must agree — pinning the whole device-side path (encode-once +
    folded queries + batched index chunks) at mesh level."""
    from slice3d_tpu.eval.metrics import chamfer_metrics, sample_mesh_surface
    from slice3d_tpu.mesh.extract import GridRefiner, extract_mesh_from_grid, \
        lattice_to_points

    tmodel, slices, proj = twin
    variables = torch_import.gtslice_model(tmodel.state_dict())
    model = GTSliceModel(n_slices=N_SLICES)
    recon = Reconstructor(model, variables, resolution0=RES0,
                          upsampling_steps=1, threshold=THRESHOLD,
                          chunk_size=1024, transport_dtype="float32",
                          extract_method="tetrahedra")
    feed = {"img_slices": slices, "trans_mat_wo_rot_tp": proj}
    grid, _, _ = recon._build_grid(feed)
    mesh = recon._march_one(grid, {})

    # -- torch side: same refinement schedule, reference-style evaluation --
    t_slices = torch.from_numpy(slices[None]).permute(0, 1, 4, 2, 3)
    t_proj = torch.from_numpy(proj[None])
    flip = np.array([1.0, -1.0, -1.0], np.float32)

    def torch_eval(idx, res):
        pts = lattice_to_points(np.asarray(idx, np.int64), res, 1.0)
        vals = []
        with torch.no_grad():
            for i in range(0, len(pts), 3000):
                q = (pts[i:i + 3000] * flip)[None]
                sdf = tmodel(t_slices, torch.from_numpy(q), t_proj)
                vals.append(-sdf[0].numpy())
        return np.concatenate(vals) if vals else np.zeros((0,), np.float32)

    logit_thr = float(np.log(THRESHOLD) - np.log(1.0 - THRESHOLD))
    refiner = GridRefiner(resolution0=RES0, upsampling_steps=1,
                          threshold=logit_thr, box_size=1.0)
    t_grid = refiner.build(torch_eval)
    np.testing.assert_allclose(grid, t_grid, atol=3e-3, rtol=1e-3)

    t_mesh = extract_mesh_from_grid(t_grid, logit_thr, 1.0,
                                    method="tetrahedra")
    assert not mesh.is_empty and not t_mesh.is_empty
    # the refinement actually evaluated fine-level points (real surface)
    _, _, st = recon._build_grid(feed)
    assert st["n_points_evaluated"] > (RES0 + 1) ** 3

    # near-identical grids + same extractor => same topology, and vertex
    # positions (edge-crossing interpolation + box normalization,
    # reconstruct.py:195-208) agree to float tolerance
    assert len(mesh.vertices) == len(t_mesh.vertices)
    assert len(mesh.faces) == len(t_mesh.faces)
    np.testing.assert_allclose(mesh.vertices, t_mesh.vertices, atol=1e-4)

    # and the sampled-surface Chamfer is bounded by sampling noise
    a = sample_mesh_surface(mesh.vertices, mesh.faces, 2000, seed=0)
    b = sample_mesh_surface(t_mesh.vertices, t_mesh.faces, 2000, seed=1)
    m = chamfer_metrics(a, b)
    assert m["chamfer_l1"] < 0.05, m