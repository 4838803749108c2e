"""Reconstructor pipeline tests (tiny shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slice3d_tpu import camera
from slice3d_tpu.models.gtslice import GTSliceModel
from slice3d_tpu.pipeline import Reconstructor


@pytest.fixture(scope="module")
def recon():
    model = GTSliceModel(n_slices=2)
    rng = np.random.default_rng(0)
    slices = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3)).astype(np.float32))
    qry = jnp.zeros((1, 8, 3), jnp.float32)
    rot, proj = camera.camera_matrices(0.2, 0.1, 1.2)
    variables = model.init(
        jax.random.PRNGKey(0), slices,
        qry, jnp.asarray(proj[None].astype(np.float32)),
        jnp.asarray(rot[None].astype(np.float32)),
    )
    return Reconstructor(
        model, variables, resolution0=8, upsampling_steps=1,
        chunk_size=1024, simplify_nfaces=0,
    )


def make_feed(seed):
    rng = np.random.default_rng(seed)
    _, proj = camera.camera_matrices(0.2, 0.1, 1.2)
    return {
        "img_slices": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
        "trans_mat_wo_rot_tp": proj.astype(np.float32),
    }


def test_reconstruct_single(recon):
    mesh, stats = recon.reconstruct(make_feed(1))
    assert stats["final_resolution"] == 16
    assert "time_marching" in stats


def test_reconstruct_all_pipelined_matches_single(recon):
    feeds = [make_feed(i) for i in range(3)]
    singles = [recon.reconstruct(f) for f in feeds]

    results = {}
    recon.reconstruct_all(iter(feeds), lambda j, mesh, st: results.__setitem__(j, (mesh, st)))
    assert sorted(results) == [0, 1, 2]
    for j, (mesh, _) in results.items():
        ref_mesh, _ = singles[j]
        assert len(mesh.vertices) == len(ref_mesh.vertices)
        if len(mesh.vertices):
            np.testing.assert_allclose(mesh.vertices, ref_mesh.vertices, atol=1e-5)


def test_reconstruct_batched_matches_single(recon):
    """batch_size > 1 pools objects per dispatch; results must be
    identical to the serial path (same indices, same values)."""
    model, variables = recon.model, recon.variables
    batched = Reconstructor(
        model, variables, resolution0=8, upsampling_steps=1,
        chunk_size=1024, batch_size=4,
    )
    feeds = [make_feed(i) for i in range(6)]  # 4 + tail of 2 (padded)
    singles = [recon.reconstruct(f) for f in feeds]

    results = {}
    batched.reconstruct_all(
        iter(feeds), lambda j, mesh, st: results.__setitem__(j, (mesh, st)))
    assert sorted(results) == list(range(6))
    for j, (mesh, st) in results.items():
        ref_mesh, ref_st = singles[j]
        assert st["n_points_evaluated"] == ref_st["n_points_evaluated"]
        assert len(mesh.vertices) == len(ref_mesh.vertices)
        if len(mesh.vertices):
            np.testing.assert_allclose(
                mesh.vertices, ref_mesh.vertices, atol=1e-5)


def test_reconstruct_batch_sharded_over_mesh(recon):
    """The object batch shards over the mesh's data axis (multi-device
    inference, SURVEY §2.5); values must match the unsharded path."""
    from slice3d_tpu.parallel import create_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    mesh = create_mesh((n_dev, 1))
    model, variables = recon.model, recon.variables
    sharded = Reconstructor(
        model, variables, resolution0=8, upsampling_steps=1,
        chunk_size=1024, batch_size=n_dev, mesh=mesh,
    )
    feeds = [make_feed(i) for i in range(n_dev)]
    out = sharded.reconstruct_batch(feeds)
    for (mesh_s, _), feed in zip(out, feeds):
        ref_mesh, _ = recon.reconstruct(feed)
        assert len(mesh_s.vertices) == len(ref_mesh.vertices)
        if len(mesh_s.vertices):
            np.testing.assert_allclose(
                mesh_s.vertices, ref_mesh.vertices, atol=1e-5)


def test_reconstruct_points_sharded_over_mesh(recon):
    """Latency mode: shard_axis='points' splits each chunk's SDF query
    axis over the mesh at batch_size 1 (SURVEY §2.5 'shard SDF query
    chunks'); the mesh must match the single-device result."""
    from slice3d_tpu.parallel import create_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    mesh = create_mesh((n_dev, 1))
    model, variables = recon.model, recon.variables
    sharded = Reconstructor(
        model, variables, resolution0=8, upsampling_steps=1,
        chunk_size=1024, batch_size=1, mesh=mesh, shard_axis="points",
    )
    feed = make_feed(3)
    mesh_s, stats = sharded.reconstruct(feed)
    ref_mesh, ref_stats = recon.reconstruct(feed)
    assert stats["n_points_evaluated"] == ref_stats["n_points_evaluated"]
    assert len(mesh_s.vertices) == len(ref_mesh.vertices)
    if len(mesh_s.vertices):
        np.testing.assert_allclose(mesh_s.vertices, ref_mesh.vertices,
                                   atol=1e-5)
    np.testing.assert_array_equal(mesh_s.faces, ref_mesh.faces)

    # two refinement levels under points sharding (the masked-level
    # evaluator path at res0 4 -> 16 effective)
    sharded2 = Reconstructor(
        model, variables, resolution0=4, upsampling_steps=2,
        chunk_size=1024, batch_size=1, mesh=mesh, shard_axis="points",
    )
    ref2 = Reconstructor(model, variables, resolution0=4,
                         upsampling_steps=2, chunk_size=1024)
    m2, st2 = sharded2.reconstruct(feed)
    r2, rst2 = ref2.reconstruct(feed)
    assert st2["n_points_evaluated"] == rst2["n_points_evaluated"]
    assert len(m2.vertices) == len(r2.vertices)

    # bad configuration fails loudly
    with pytest.raises(ValueError, match="chunk_size"):
        Reconstructor(model, variables, resolution0=8, chunk_size=1023,
                      mesh=mesh, shard_axis="points")
    with pytest.raises(ValueError, match="shard_axis"):
        Reconstructor(model, variables, resolution0=8, mesh=mesh,
                      shard_axis="nope")


def test_reconstruct_with_refinement(recon):
    """refine_steps polishes vertices through the model's xyz query path."""
    feed = make_feed(2)
    base_mesh, _ = recon.reconstruct(feed)
    if base_mesh.is_empty:
        pytest.skip("random-init model produced an empty mesh")
    recon.refine_steps = 3
    try:
        mesh, stats = recon.reconstruct(feed)
    finally:
        recon.refine_steps = 0
    assert "time_refine" in stats
    assert mesh.vertices.shape == base_mesh.vertices.shape
    assert np.isfinite(mesh.vertices).all()
    # vertices actually moved
    assert np.abs(mesh.vertices - base_mesh.vertices).max() > 0


def test_disn_batched_matches_single():
    """The DISN branch of the batched pipeline (full-projection extras +
    object rotation) matches its serial path."""
    from slice3d_tpu.models.disn import DISNModel

    model = DISNModel()
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    rot, _ = camera.camera_matrices(0.2, 0.1, 1.2)
    proj_full = camera.full_projection_matrix(0.2, 0.1, 1.2).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, jnp.zeros((1, 8, 3), jnp.float32),
        jnp.asarray(proj_full[None]), jnp.asarray(rot[None].astype(np.float32)),
    )

    def feed(seed):
        r = np.random.default_rng(seed)
        return {
            "img_input": r.normal(size=(32, 32, 3)).astype(np.float32),
            "trans_mat_right": proj_full,
            "obj_rot_mat": rot.astype(np.float32),
        }

    single = Reconstructor(model, variables, resolution0=8,
                           upsampling_steps=1, chunk_size=512)
    batched = Reconstructor(model, variables, resolution0=8,
                            upsampling_steps=1, chunk_size=512, batch_size=2)
    feeds = [feed(1), feed(2)]
    singles = [single.reconstruct(f) for f in feeds]
    for (mesh_b, st_b), (mesh_s, st_s) in zip(
            batched.reconstruct_batch(feeds), singles):
        assert st_b["n_points_evaluated"] == st_s["n_points_evaluated"]
        assert len(mesh_b.vertices) == len(mesh_s.vertices)
        if len(mesh_b.vertices):
            np.testing.assert_allclose(mesh_b.vertices, mesh_s.vertices,
                                       atol=1e-5)


def test_fused_levels_matches_classic(recon):
    """The single-dispatch fused-levels path (device-side masks + capped
    nonzero selection) must produce grids BIT-identical to the classic
    per-level path, including across the cap-learning transition."""
    model, variables = recon.model, recon.variables
    kw = dict(resolution0=8, upsampling_steps=2, chunk_size=256)
    classic = Reconstructor(model, variables, fuse_levels=False, **kw)
    fused = Reconstructor(model, variables, fuse_levels=True, **kw)

    feed = make_feed(3)
    g_classic, _, st_c = classic._build_grid(feed)
    g1, _, _ = fused._build_grid(feed)       # learning run (classic inside)
    assert fused._caps_k() is not None
    g2, _, st_f = fused._build_grid(feed)    # fused run
    np.testing.assert_array_equal(g_classic, g1)
    np.testing.assert_array_equal(g_classic, g2)
    assert st_f["n_points_evaluated"] == st_c["n_points_evaluated"]

    # a different object through the now-fused path still matches classic
    feed2 = make_feed(4)
    g_c2, _, _ = classic._build_grid(feed2)
    g_f2, _, _ = fused._build_grid(feed2)
    np.testing.assert_array_equal(g_c2, g_f2)


def test_fused_levels_cap_overflow_falls_back(recon):
    """Cap overflow at the FIRST level: that level and every later one
    (stale device grid) re-evaluate classically; the grid stays identical
    and the learned cap grows."""
    model, variables = recon.model, recon.variables
    kw = dict(resolution0=8, upsampling_steps=2, chunk_size=64)
    classic = Reconstructor(model, variables, fuse_levels=False, **kw)
    fused = Reconstructor(model, variables, fuse_levels=True, **kw)

    feed = make_feed(3)
    g_classic, _, _ = classic._build_grid(feed)
    fused._build_grid(feed)  # learn real counts
    seen = list(fused._cap_seen)
    assert seen[0] > 64, "test premise: level-1 count must exceed one chunk"
    fused._cap_seen = [1] + seen[1:]  # force level-1 cap to 1 chunk (64)
    g_of, _, _ = fused._build_grid(feed)
    np.testing.assert_array_equal(g_classic, g_of)
    assert fused._cap_seen[0] == seen[0]  # cap re-learned from the fallback


def test_warm_precompiles_buckets_and_serving_still_exact(recon):
    """Reconstructor.warm compiles the padded-k specializations without
    corrupting state: results after warm() match a cold Reconstructor,
    and the fused-cap learning is untouched by the dummy evaluations."""
    model, variables = recon.model, recon.variables
    warmed = Reconstructor(
        model, variables, resolution0=8, upsampling_steps=1,
        chunk_size=1024, batch_size=2,
    )
    feeds = [make_feed(10), make_feed(11)]
    buckets = warmed.warm(feeds, k_buckets=(1, 2, 5))
    assert buckets == [1, 2, 6]          # 5 pads to 6 on the 1/1.5-pow2 grid
    assert warmed._cap_seen == [0]       # dummy evals must not teach caps

    out = warmed.reconstruct_batch(feeds)
    for (mesh, _), feed in zip(out, feeds):
        ref_mesh, _ = recon.reconstruct(feed)
        assert len(mesh.vertices) == len(ref_mesh.vertices)
        if len(mesh.vertices):
            np.testing.assert_allclose(mesh.vertices, ref_mesh.vertices,
                                       atol=1e-5)


def test_lattice_dense_matches_gather(recon, monkeypatch):
    """The separable tensor-grid coarse level (ops/lattice_sample.py)
    reproduces the gather path's dense grid (same mesh out)."""
    feed = make_feed(4)
    monkeypatch.setenv("SLICE3D_LATTICE_DENSE", "0")
    ref_mesh, _ = recon.reconstruct(feed)
    monkeypatch.setenv("SLICE3D_LATTICE_DENSE", "1")
    mesh, _ = recon.reconstruct(feed)
    assert len(mesh.vertices) == len(ref_mesh.vertices)
    if len(mesh.vertices):
        np.testing.assert_allclose(mesh.vertices, ref_mesh.vertices,
                                   atol=1e-4)
