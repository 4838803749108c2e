"""Eval metric tests (device NN distances vs scipy, OBJ IO)."""

import numpy as np
import pytest

from slice3d_tpu.eval.metrics import (
    chamfer_metrics,
    hausdorff_distance,
    nn_distances,
    occupancy_iou,
    sample_mesh_surface,
)


def test_nn_distances_vs_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3)).astype(np.float32)
    b = rng.normal(size=(700, 3)).astype(np.float32)
    ours = nn_distances(a, b)
    ref, _ = cKDTree(b).query(a, k=1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_chamfer_identical_is_zero():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    m = chamfer_metrics(pts, pts)
    assert m["chamfer_l1"] < 1e-5
    assert m["fscore"] == 1.0


def test_chamfer_shifted():
    rng = np.random.default_rng(2)
    pts = rng.uniform(size=(2000, 3)).astype(np.float32)
    shifted = pts + np.array([0.05, 0, 0], np.float32)
    m = chamfer_metrics(pts, shifted, f_threshold=0.01)
    assert abs(m["chamfer_l1"] - 0.05) < 0.01
    assert m["fscore"] < 0.5
    assert abs(hausdorff_distance(pts, shifted) - 0.05) < 0.02


def test_occupancy_iou_basic():
    a = np.array([1, 1, 0, 0], bool)
    b = np.array([1, 0, 1, 0], bool)
    assert occupancy_iou(a, b) == pytest.approx(1 / 3)
    assert occupancy_iou(np.zeros(4, bool), np.zeros(4, bool)) == 1.0


def test_surface_sampling_on_triangle():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    pts = sample_mesh_surface(verts, faces, 500)
    assert pts.shape == (500, 3)
    np.testing.assert_array_equal(pts[:, 2], 0)
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-6).all()
    assert (pts >= -1e-6).all()


def test_obj_roundtrip(tmp_path):
    from eval import load_obj
    from slice3d_tpu.mesh import Mesh, export_obj

    mesh = Mesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int64),
    )
    path = str(tmp_path / "m.obj")
    export_obj(mesh, path)
    back = load_obj(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-5)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_icp_recovers_rigid_transform():
    """ICP (eval/icp.py, role of src_convonet/utils/icp.py) recovers a
    known rotation+translation between samplings of the same cloud."""
    from slice3d_tpu.eval.icp import best_fit_transform, icp

    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(500, 3))
    ang = 0.15
    r_true = np.array([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ])
    t_true = np.array([0.04, -0.02, 0.03])
    dst = pts @ r_true.T + t_true

    # exact correspondences -> closed form is exact
    tm, r, t = best_fit_transform(pts, dst)
    np.testing.assert_allclose(r, r_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)

    # ICP from unknown correspondences (shuffled target)
    tm, dists, its = icp(pts, dst[rng.permutation(len(dst))],
                         max_iterations=30)
    aligned = pts @ tm[:3, :3].T + tm[:3, 3]
    assert float(np.abs(aligned - dst).max()) < 1e-4
    assert float(dists.mean()) < 1e-4


def test_eval_runner_icp_align(tmp_path):
    """eval.py --icp_align drives ICP inside the runner: a rigidly
    transformed result mesh scores near-zero Chamfer after alignment and
    much worse without it."""
    import eval as eval_runner
    from slice3d_tpu.mesh import Mesh, export_obj

    # GT: a tetrahedron-ish mesh; result: the same mesh rotated + shifted
    verts = np.array([[0, 0, 0], [0.3, 0, 0], [0, 0.3, 0], [0, 0, 0.3]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int64)
    ang = 0.2
    r = np.array([[np.cos(ang), -np.sin(ang), 0.0],
                  [np.sin(ang), np.cos(ang), 0.0],
                  [0.0, 0.0, 1.0]], np.float32)
    moved = Mesh(vertices=verts @ r.T + np.float32([0.05, -0.03, 0.02]),
                 faces=faces)

    root = tmp_path / "data" / "tiny"
    (root / "03_splits").mkdir(parents=True)
    (root / "03_splits" / "test.lst").write_text("00000\n")
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    export_obj(Mesh(vertices=verts, faces=faces), str(gt_dir / "00000.obj"))
    res_dir = tmp_path / "experiments" / "e" / "results" / "tiny"
    res_dir.mkdir(parents=True)
    export_obj(moved, str(res_dir / "00000.obj"))

    common = ["--name_exp", "e", "--name_dataset", "tiny",
              "--dir_data", str(tmp_path / "data"),
              "--dir_experiments", str(tmp_path / "experiments"),
              "--dir_gt_meshes", str(gt_dir), "--n_pts", "10000"]
    raw = eval_runner.main(common)
    aligned = eval_runner.main(common + ["--icp_align"])
    assert aligned["chamfer_l1"] < raw["chamfer_l1"] * 0.2
    assert aligned["chamfer_l1"] < 5e-3
