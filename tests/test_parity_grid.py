"""Global z-ray parity grid vs exact winding-number solid tests.

The grid replaces per-query winding numbers in prepare-time island
connectivity (same closed source solid for every candidate); these tests pin
its agreement with the exact oracle away from the surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.io.models import get_model
from surtr_tpu.ops.mesh_clip import (
    build_parity_grid,
    parity_grid_inside,
    winding_inside,
)


@pytest.mark.parametrize("model", ["cube", "sphere"])
def test_parity_grid_matches_winding(model):
    v, f = get_model(model)
    corners = jnp.asarray(v[f])
    tmask = jnp.ones(len(f), bool)
    grid = jax.jit(lambda c, m: build_parity_grid(c, m, res=48))(
        corners, tmask
    )

    lo = np.asarray(v).min(0)
    hi = np.asarray(v).max(0)
    ext = hi - lo
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        (lo - 0.2 * ext) + rng.rand(512, 3) * (1.4 * ext), jnp.float32
    )
    got = np.asarray(parity_grid_inside(grid, pts))
    want = np.asarray(winding_inside(pts, corners, tmask))

    # Disagreement is allowed only within a cell of the surface (the grid
    # snaps queries to cell centers). "Far from the surface" = the exact
    # classification is constant over a one-cell ball around the point
    # (checked at the 6 axis offsets).
    cell = float(np.max(ext) / 48)
    offs = cell * np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    nb = np.stack(
        [
            np.asarray(winding_inside(pts + o[None], corners, tmask))
            for o in offs
        ],
        axis=1,
    )
    far = (nb == want[:, None]).all(axis=1)
    assert far.sum() > 100  # the probe cloud actually exercises the test
    np.testing.assert_array_equal(got[far], want[far])


def test_parity_grid_outside_bbox_is_outside():
    v, f = get_model("cube")
    corners = jnp.asarray(v[f])
    grid = build_parity_grid(corners, jnp.ones(len(f), bool), res=16)
    far = jnp.asarray([[50.0, 0.0, 0.0], [0.0, -50.0, 0.0]], jnp.float32)
    assert not bool(parity_grid_inside(grid, far).any())


def test_labels_pallas_matches_xla():
    """Interpret-mode Pallas soup labeling == the XLA closure on a batch of
    candidate-like soups (two islands, degenerate, empty)."""
    from surtr_tpu.ops.labels import tri_soup_components
    from surtr_tpu.ops.labels_pallas import tri_soup_components_batch_pallas

    rng = np.random.RandomState(3)
    N, T = 6, 16
    corners = rng.rand(N, T, 3, 3).astype(np.float32)
    # Candidate 0: a strip (every tri shares a corner with the next).
    for t in range(T - 1):
        corners[0, t + 1, 0] = corners[0, t, 1]
    # Candidate 1: two strips (break in the middle).
    for t in range(T - 1):
        if t != T // 2 - 1:
            corners[1, t + 1, 0] = corners[1, t, 1]
    valid = np.ones((N, T), bool)
    valid[2, :] = False                 # empty candidate
    valid[3, T // 2 :] = False          # half-valid
    corners = jnp.asarray(corners)
    valid = jnp.asarray(valid)

    got = tri_soup_components_batch_pallas(corners, valid, interpret=True)
    want = jnp.stack(
        [tri_soup_components(corners[i], valid[i]) for i in range(N)]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_refit_pallas_matches_xla():
    """Interpret-mode Pallas refit == vmapped tetra-hull + k-DOP planes."""
    from surtr_tpu.fracture.pipeline import refit_planes
    from surtr_tpu.ops.refit_pallas import refit_planes_batch_pallas

    rng = np.random.RandomState(5)
    N, Pv = 5, 40
    pool = jnp.asarray(rng.randn(N, Pv, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(N, Pv) > 0.3)
    # Degenerate candidates: too few points / all masked.
    mask = mask.at[3, 4:].set(False)
    mask = mask.at[4, :].set(False)

    got_p, got_m = refit_planes_batch_pallas(pool, mask, interpret=True)
    want_p, want_m = jax.vmap(lambda v, m: refit_planes(v, m, 4))(pool, mask)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    gp = np.asarray(got_p)[np.asarray(got_m)]
    wp = np.asarray(want_p)[np.asarray(want_m)]
    np.testing.assert_allclose(gp, wp, rtol=1e-5, atol=1e-5)


def test_ich_pallas_matches_xla():
    """Interpret-mode Pallas ICH == the XLA greedy hull (normal sets and
    face counts; slot order matches the argsort-based assignment)."""
    from surtr_tpu.io.models import get_model
    from surtr_tpu.ops.hull import ich
    from surtr_tpu.ops.hull_pallas import ich_pallas

    rng = np.random.RandomState(7)
    clouds = [
        jnp.asarray(get_model("cube")[0]),
        jnp.asarray(rng.randn(40, 3), jnp.float32),
        jnp.asarray(rng.rand(100, 3) * jnp.asarray([2.0, 1.0, 0.5]),
                    jnp.float32),
    ]
    for pts in clouds:
        m = jnp.ones(pts.shape[0], bool)
        want = ich(pts, m, limit=20)
        got = ich_pallas(pts, m, limit=20, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got["face_valid"]), np.asarray(want["face_valid"])
        )
        np.testing.assert_allclose(
            np.asarray(got["inner"]), np.asarray(want["inner"]), rtol=1e-6
        )
        gv = np.asarray(got["normals"])[np.asarray(got["face_valid"])]
        wv = np.asarray(want["normals"])[np.asarray(want["face_valid"])]
        np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-6)
