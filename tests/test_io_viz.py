"""Tests for mesh/io.py (PLY/OFF) and utils/viz.py (matplotlib debug plots).

Parity targets: reg_slices/src_convonet/utils/io.py and visualize.py.
"""
import numpy as np
import pytest

from slice3d_tpu.mesh.io import export_pointcloud, load_pointcloud, read_off

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("as_text", [True, False])
def test_ply_roundtrip(tmp_path, as_text):
    pts = RNG.normal(size=(137, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    export_pointcloud(pts, path, as_text=as_text)
    back = load_pointcloud(path)
    assert back.dtype == np.float32
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)


def test_ply_load_skips_extra_props(tmp_path):
    # a binary PLY whose vertex element carries colors after x/y/z
    path = tmp_path / "rgb.ply"
    pts = RNG.normal(size=(5, 3)).astype("<f4")
    rgb = RNG.integers(0, 255, size=(5, 3)).astype("u1")
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 5\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
              b"end_header\n")
    rec = np.zeros(5, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("r", "u1"), ("g", "u1"), ("b", "u1")])
    rec["x"], rec["y"], rec["z"] = pts.T
    rec["r"], rec["g"], rec["b"] = rgb.T
    path.write_bytes(header + rec.tobytes())
    np.testing.assert_allclose(load_pointcloud(str(path)), pts, atol=1e-6)


def test_export_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        export_pointcloud(np.zeros((4, 2)), str(tmp_path / "x.ply"))


def _write_off(path, body):
    path.write_text(body)
    return str(path)


def test_read_off_regular_and_modelnet(tmp_path):
    verts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
             (0.0, 0.0, 1.0)]
    faces = [(3, 0, 1, 2), (3, 0, 1, 3)]
    vtxt = "\n".join(" ".join(str(c) for c in v) for v in verts)
    ftxt = "\n".join(" ".join(str(i) for i in f) for f in faces)

    regular = _write_off(tmp_path / "a.off", f"OFF\n4 2 0\n{vtxt}\n{ftxt}\n")
    v, f = read_off(regular)
    assert v == verts and f == faces

    # ModelNet quirk: counts glued to the OFF keyword line
    glued = _write_off(tmp_path / "b.off", f"OFF4 2 0\n{vtxt}\n{ftxt}\n")
    v, f = read_off(glued)
    assert v == verts and f == faces


def test_read_off_rejects_quads_and_bad_index(tmp_path):
    with pytest.raises(ValueError, match="triangular"):
        read_off(_write_off(tmp_path / "q.off",
                            "OFF\n4 1 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
                            "4 0 1 2 3\n"))
    with pytest.raises(ValueError, match="out of range"):
        read_off(_write_off(tmp_path / "i.off",
                            "OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 9\n"))


def test_visualizers_write_images(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from slice3d_tpu.utils.viz import (visualize_data, visualize_pointcloud,
                                       visualize_voxels)

    vox = np.zeros((4, 4, 4), bool)
    vox[1:3, 1:3, 1:3] = True
    out_v = tmp_path / "vox.png"
    visualize_voxels(vox, out_file=str(out_v))
    assert out_v.stat().st_size > 0

    pts = RNG.uniform(-0.4, 0.4, size=(64, 3))
    nrm = RNG.normal(size=(64, 3))
    out_p = tmp_path / "pc.png"
    visualize_pointcloud(pts, normals=nrm, out_file=str(out_p))
    assert out_p.stat().st_size > 0

    out_d = tmp_path / "d.png"
    visualize_data(vox, "voxels", str(out_d))
    assert out_d.stat().st_size > 0
    visualize_data(None, "idx", str(tmp_path / "ignored.png"))  # no-op
    with pytest.raises(ValueError):
        visualize_data(pts, "nope", str(tmp_path / "x.png"))
