"""hat_sample: dense hat-basis bilinear sampling == the 4-corner gather."""

import numpy as np

import jax.numpy as jnp

from slice3d_tpu.models.sdf_head import sample_packed_sum
from slice3d_tpu.ops.hat_sample import hat_sample_level, hat_sample_sum


def _gather_ref(plane, uv):
    """The existing gather path, single level (via sample_packed_sum with
    n_slices=1 so the trailing reshape is a no-op)."""
    out = sample_packed_sum([plane], uv, n_slices=1, hat_max_rows=0)
    return out.reshape(out.shape[0], out.shape[1], -1)


def test_hat_matches_gather_in_range():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(2, 9, 7, 24)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1, 1, (2, 333, 2)).astype(np.float32))
    ref = _gather_ref(plane, uv)
    x = uv[..., 0]
    y = uv[..., 1]
    got = hat_sample_level(plane, (x + 1) * 0.5 * (7 - 1), (y + 1) * 0.5 * (9 - 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_hat_matches_gather_out_of_range():
    """Zero-padding semantics: out-of-range corners contribute nothing."""
    rng = np.random.default_rng(1)
    plane = jnp.asarray(rng.normal(size=(1, 5, 5, 8)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.8, 1.8, (1, 500, 2)).astype(np.float32))
    ref = _gather_ref(plane, uv)
    got = hat_sample_level(plane, (uv[..., 0] + 1) * 2.0, (uv[..., 1] + 1) * 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_hat_sample_sum_routing_and_values():
    """Levels <= max_rows route through hat and sum exactly like the
    gather path; larger levels are handed back."""
    rng = np.random.default_rng(2)
    small = jnp.asarray(rng.normal(size=(1, 8, 8, 12)).astype(np.float32))
    small2 = jnp.asarray(rng.normal(size=(1, 16, 16, 12)).astype(np.float32))
    big = jnp.asarray(rng.normal(size=(1, 64, 64, 12)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1, 1, (1, 200, 2)).astype(np.float32))

    total, rest = hat_sample_sum([small, small2, big], uv, max_rows=256)
    assert len(rest) == 1 and rest[0] is big
    ref = _gather_ref(small, uv) + _gather_ref(small2, uv)
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_hat_obj_index_selects_plane_set():
    rng = np.random.default_rng(3)
    planes = jnp.asarray(rng.normal(size=(3, 8, 8, 4)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1, 1, (1, 50, 2)).astype(np.float32))
    for oid in range(3):
        total, _ = hat_sample_sum([planes], uv, obj_index=jnp.asarray([oid]),
                                  max_rows=64)
        ref = _gather_ref(planes[oid:oid + 1], uv)
        np.testing.assert_allclose(np.asarray(total), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_patch_gather_matches_rows():
    """The (2,2,C) patch lax.gather equals the 4x row-gather path on
    clamped coords, including exact corners/edges (SLICE3D_GATHER=patch)."""
    import os

    from slice3d_tpu.models import sdf_head as sh

    rng = np.random.default_rng(4)
    packed = [jnp.asarray(rng.normal(size=(2, hw, hw, 24)).astype(np.float32))
              for hw in (64, 16)]
    uv = np.clip(rng.uniform(-1.2, 1.2, (2, 97, 2)), -1, 1).astype(np.float32)
    uv[0, :4] = [[-1, -1], [1, 1], [1, -1], [0.999999, 0.5]]
    uv = jnp.asarray(uv)
    old = os.environ.get("SLICE3D_GATHER")
    try:
        os.environ["SLICE3D_GATHER"] = "rows"
        ref = sh.sample_packed_sum(packed, uv, 12, hat_max_rows=0)
        os.environ["SLICE3D_GATHER"] = "patch"
        got = sh.sample_packed_sum(packed, uv, 12, hat_max_rows=0)
        oi = jnp.asarray([1])
        got1 = sh.sample_packed_sum(packed, uv[:1], 12, obj_index=oi,
                                    hat_max_rows=0)
        os.environ["SLICE3D_GATHER"] = "rows"
        ref1 = sh.sample_packed_sum(packed, uv[:1], 12, obj_index=oi,
                                    hat_max_rows=0)
    finally:
        if old is None:
            os.environ.pop("SLICE3D_GATHER", None)
        else:
            os.environ["SLICE3D_GATHER"] = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               atol=1e-5, rtol=1e-5)


def test_quad_gather_matches_rows():
    """quad_pack + one-row-gather sampling equals the 4x row-gather path,
    including out-of-range coords (zero padding) and obj_index selection
    (SLICE3D_GATHER=quad)."""
    import os

    from slice3d_tpu.models import sdf_head as sh

    rng = np.random.default_rng(5)
    packed = [jnp.asarray(rng.normal(size=(2, hw, hw, 24)).astype(np.float32))
              for hw in (64, 16)]
    uv = rng.uniform(-1.6, 1.6, (2, 97, 2)).astype(np.float32)
    uv[0, :4] = [[-1, -1], [1, 1], [1, -1], [0.999999, 0.5]]
    uv = jnp.asarray(uv)
    old = os.environ.get("SLICE3D_GATHER")
    try:
        os.environ["SLICE3D_GATHER"] = "rows"
        ref = sh.sample_packed_sum(packed, uv, 12, hat_max_rows=0)
        os.environ["SLICE3D_GATHER"] = "quad"
        quads = sh.maybe_quad_pack(packed, hat_max_rows=0)
        assert all(q.shape[-1] == 4 * p.shape[-1]
                   for q, p in zip(quads, packed))
        got = sh.sample_packed_sum(quads, uv, 12, hat_max_rows=0)
        oi = jnp.asarray([1])
        got1 = sh.sample_packed_sum(quads, uv[:1], 12, obj_index=oi,
                                    hat_max_rows=0)
        os.environ["SLICE3D_GATHER"] = "rows"
        ref1 = sh.sample_packed_sum(packed, uv[:1], 12, obj_index=oi,
                                    hat_max_rows=0)
        # hat routing unaffected: levels under max_rows stay un-quadded
        os.environ["SLICE3D_GATHER"] = "quad"
        mixed = sh.maybe_quad_pack(packed, hat_max_rows=16 * 16)
        assert mixed[1] is packed[1] and mixed[0].shape[-1] == 96
    finally:
        if old is None:
            os.environ.pop("SLICE3D_GATHER", None)
        else:
            os.environ["SLICE3D_GATHER"] = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               atol=1e-5, rtol=1e-5)
