"""Unit tests for the convex clip kernel (SURVEY.md §4: plane-clip of a cube
with known vertex/face counts and volumes, complementary-clip volume
conservation, convexity of outputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.ops.clip import (
    clip_batch_by_cells,
    clip_poly_plane,
    clip_poly_planes,
    clip_poly_poly,
    contains_point,
)
from surtr_tpu.ops.moments import moments, aabb
from surtr_tpu.types import scale_poly, translate_poly, unit_cube


def test_cube_halfspace_volume_and_centroid():
    cube = unit_cube()
    out = clip_poly_plane(cube, jnp.array([1.0, 0, 0, -0.25]))
    v, c = moments(out)
    assert np.isclose(float(v), 0.75, atol=1e-6)
    assert np.allclose(np.asarray(c), [-0.125, 0, 0], atol=1e-6)
    # 6 faces again (one face replaced by the cap).
    assert int((out.n_verts >= 3).sum()) == 6


def test_complementary_clips_conserve_volume():
    """clip(P, n) ∪ clip(P, −n) volumes sum to vol(P) (SURVEY §4 property)."""
    cube = unit_cube()
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        d = rng.uniform(-0.4, 0.4)
        pl = jnp.asarray(np.append(n, d), jnp.float32)
        va = float(moments(clip_poly_plane(cube, pl))[0])
        vb = float(moments(clip_poly_plane(cube, -pl))[0])
        assert np.isclose(va + vb, 1.0, atol=1e-5)


def test_cut_through_vertex_keeps_cap_closed():
    """Tangent/vertex-incident cuts must not notch the cap (regression for
    the in-plane-vertex cap rule; reference comp==0 handling)."""
    cube = unit_cube()
    # Plane through the exact diagonal of the top face: x + y = 0.
    n = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    pl = jnp.asarray(np.append(n, 0.0), jnp.float32)
    out = clip_poly_plane(cube, pl)
    assert np.isclose(float(moments(out)[0]), 0.5, atol=1e-6)
    # Corner-tangent plane removes nothing.
    s3 = np.sqrt(3)
    tangent = jnp.asarray([1 / s3, 1 / s3, 1 / s3, -1.5 / s3], jnp.float32)
    out2 = clip_poly_plane(cube, tangent)
    assert np.isclose(float(moments(out2)[0]), 1.0, atol=1e-6)


def test_reclip_by_own_face_plane_is_noop():
    cube = unit_cube()
    out = clip_poly_plane(cube, jnp.array([1.0, 0, 0, -0.5]))
    assert np.isclose(float(moments(out)[0]), 1.0, atol=1e-7)
    assert int((out.n_verts >= 3).sum()) == 6


def test_fully_outside_clip_empties_polytope():
    cube = unit_cube()
    out = clip_poly_plane(cube, jnp.array([1.0, 0, 0, 1.0]))  # x < -1
    assert bool(out.is_empty())
    assert float(moments(out)[0]) == 0.0


def test_clip_by_polytope_intersection():
    cube = unit_cube()
    other = translate_poly(unit_cube(), jnp.array([0.25, 0.25, 0.25]))
    inter = clip_poly_poly(cube, other)
    v, c = moments(inter)
    assert np.isclose(float(v), 0.75**3, atol=1e-6)
    assert np.allclose(np.asarray(c), [0.125] * 3, atol=1e-6)


def test_output_is_convex_all_verts_behind_all_planes():
    """Every output fragment is convex: vertices inside all face planes
    (SURVEY §4 property test)."""
    cube = scale_poly(unit_cube(), 2.0)
    rng = np.random.default_rng(3)
    planes = []
    for _ in range(6):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        planes.append(np.append(n, rng.uniform(-0.5, 0.1)))
    out = clip_poly_planes(cube, jnp.asarray(np.stack(planes), jnp.float32))
    fv = np.asarray(out.face_verts)
    nv = np.asarray(out.n_verts)
    pl = np.asarray(out.planes)
    for f in range(out.F):
        if nv[f] < 3:
            continue
        for g in range(out.F):
            if nv[g] < 3:
                continue
            s = fv[f, : nv[f]] @ pl[g, :3] + pl[g, 3]
            assert (s < 1e-4).all()


def test_batch_grid_clip_shapes_and_values():
    cube = unit_cube()
    pieces = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a]), cube
    )  # 2 identical pieces
    cells = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]),
        translate_poly(unit_cube(), jnp.array([0.25, 0.0, 0.0])),
        translate_poly(unit_cube(), jnp.array([-0.25, 0.0, 0.0])),
    )
    out = clip_batch_by_cells(pieces, cells)
    v, _ = moments(out)
    assert v.shape == (2, 2)
    assert np.allclose(np.asarray(v), 0.75, atol=1e-6)


def test_clip_by_empty_clipper_is_empty():
    """Intersection with the empty polytope is empty (regression: an empty
    clipper must not act as the identity)."""
    from surtr_tpu.types import empty_poly

    cube = unit_cube()
    out = clip_poly_poly(cube, empty_poly(32, 16))
    assert bool(out.is_empty())
    assert float(moments(out)[0]) == 0.0


def test_contains_point():
    cube = unit_cube()
    assert bool(contains_point(cube, jnp.array([0.49, 0.0, 0.0])))
    assert not bool(contains_point(cube, jnp.array([0.51, 0.0, 0.0])))


def test_aabb():
    cube = translate_poly(unit_cube(), jnp.array([1.0, 2.0, 3.0]))
    lo, hi = aabb(cube)
    assert np.allclose(np.asarray(lo), [0.5, 1.5, 2.5], atol=1e-6)
    assert np.allclose(np.asarray(hi), [1.5, 2.5, 3.5], atol=1e-6)
