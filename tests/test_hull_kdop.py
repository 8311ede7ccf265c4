"""ICH limited hull + k-DOP fitting tests (SURVEY §4: hull containment
property VMACH.cpp:885-894, k-DOP of canonical shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from surtr_tpu.ops.clip import clip_poly_planes
from surtr_tpu.ops.hull import ich, ich_contains
from surtr_tpu.ops.kdop import dop26_directions, kdop_planes
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import scale_poly, unit_cube


def _cube_corners():
    return np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        np.float32,
    )


def test_ich_cube_exact():
    pts = jnp.asarray(_cube_corners())
    h = ich(pts, jnp.ones(8, bool), limit=8)
    assert int(h["face_valid"].sum()) == 12  # triangulated cube
    inside = ich_contains(
        h, jnp.array([[0.0, 0, 0], [0.9, 0.9, 0.9], [1.1, 0, 0]]), pts
    )
    assert inside.tolist() == [True, True, False]


def test_ich_limited_contains_subset_and_normals_unit():
    rng = np.random.default_rng(1)
    pts_np = rng.normal(size=(200, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    h = ich(pts, jnp.ones(200, bool), limit=20)
    nf = int(h["face_valid"].sum())
    assert 4 <= nf <= 36
    nrm = np.asarray(h["normals"])[np.asarray(h["face_valid"])]
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4)
    # The hull of a subset must contain strictly interior points.
    assert bool(ich_contains(h, jnp.zeros((1, 3)), pts)[0])


def test_ich_handles_padding_mask():
    pts_np = np.zeros((32, 3), np.float32)
    pts_np[:8] = _cube_corners()
    mask = np.zeros(32, bool)
    mask[:8] = True
    h = ich(jnp.asarray(pts_np), jnp.asarray(mask), limit=8)
    assert int(h["face_valid"].sum()) == 12


def test_kdop_cube_exact_bounds():
    pts = jnp.asarray(_cube_corners())
    dirs = dop26_directions()
    planes, pm = kdop_planes(pts, jnp.ones(8, bool), dirs, gap=0.0)
    ach = clip_poly_planes(scale_poly(unit_cube(), 4.0), planes, pm)
    v, _ = moments(ach)
    # All 26 planes are tangent to the cube: ACH == the cube itself, vol 8.
    assert np.isclose(float(v), 8.0, atol=1e-4)


def test_kdop_gap_expands():
    pts = jnp.asarray(_cube_corners())
    dirs = dop26_directions()
    planes, pm = kdop_planes(pts, jnp.ones(8, bool), dirs, gap=0.01)
    ach = clip_poly_planes(scale_poly(unit_cube(), 4.0), planes, pm)
    v, _ = moments(ach)
    assert 8.0 < float(v) < 8.6


def test_ach_contains_all_input_points():
    """The reference's online invariant: 'ALL VERTEX CONTAINED'
    (FractureResult.ACHErrorPointCnt, Surtr.cpp:598-604)."""
    rng = np.random.default_rng(5)
    pts_np = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    mask = jnp.ones(500, bool)
    h = ich(pts, mask, limit=20)
    dirs = h["normals"]
    planes, pm = kdop_planes(pts, mask, dirs, h["face_valid"], gap=2.0 / 2000.0)
    ach = clip_poly_planes(scale_poly(unit_cube(), 8.0), planes, pm)
    from surtr_tpu.ops.clip import contains_point

    inside = jax.vmap(lambda x: contains_point(ach, x, tol=1e-4))(pts)
    assert bool(inside.all())
