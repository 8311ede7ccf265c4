"""Voronoi construction tests (SURVEY §4: cells tile the cube — Σ volumes = 1,
pairwise disjoint; each seed inside its own cell)."""

import jax
import jax.numpy as jnp
import numpy as np

from surtr_tpu.ops.clip import contains_point
from surtr_tpu.ops.moments import moments
from surtr_tpu.ops.voronoi import voronoi_cells


def test_cells_tile_unit_cube():
    seeds = jax.random.uniform(
        jax.random.PRNGKey(46354), (32, 3), minval=-0.5, maxval=0.5
    )
    cells = voronoi_cells(seeds, k=31)
    vols, _ = moments(cells)
    assert np.isclose(float(vols.sum()), 1.0, atol=1e-4)
    assert float(vols.min()) > 0.0


def test_seed_in_own_cell_and_nearest_property():
    seeds = jax.random.uniform(
        jax.random.PRNGKey(7), (24, 3), minval=-0.5, maxval=0.5
    )
    cells = voronoi_cells(seeds, k=23)
    own = jax.vmap(contains_point)(cells, seeds)
    assert bool(own.all())
    # Random interior points: containing cell == nearest seed.
    pts = jax.random.uniform(
        jax.random.PRNGKey(9), (100, 3), minval=-0.49, maxval=0.49
    )
    d2 = jnp.sum((pts[:, None] - seeds[None]) ** 2, -1)
    nearest = jnp.argmin(d2, axis=1)
    inside = jax.vmap(
        lambda x: jax.vmap(lambda c: contains_point(c, x, tol=1e-5))(cells)
    )(pts)
    counts = inside.sum(axis=1)
    # Each point in >= 1 cell, and the nearest seed's cell contains it.
    assert bool((counts >= 1).all())
    got = jnp.take_along_axis(inside, nearest[:, None], axis=1)[:, 0]
    assert bool(got.all())


def test_knn_pruning_matches_allpairs():
    seeds = jax.random.uniform(
        jax.random.PRNGKey(3), (64, 3), minval=-0.5, maxval=0.5
    )
    full = voronoi_cells(seeds, k=63)
    pruned = voronoi_cells(seeds, k=40)
    vf, _ = moments(full)
    vp, _ = moments(pruned)
    assert np.allclose(np.asarray(vf), np.asarray(vp), atol=1e-5)


def test_masked_seeds_give_empty_cells():
    seeds = jax.random.uniform(
        jax.random.PRNGKey(4), (16, 3), minval=-0.5, maxval=0.5
    )
    mask = jnp.arange(16) < 10
    cells = voronoi_cells(seeds, seed_mask=mask, k=15)
    vols, _ = moments(cells)
    assert np.isclose(float(vols.sum()), 1.0, atol=1e-4)
    assert np.all(np.asarray(vols[10:]) == 0.0)


def test_grid_seeds_equal_cells():
    """Regular 2x2x2 seed grid → 8 identical cells of volume 1/8."""
    g = np.array(
        [
            [x, y, z]
            for x in (-0.25, 0.25)
            for y in (-0.25, 0.25)
            for z in (-0.25, 0.25)
        ],
        np.float32,
    )
    cells = voronoi_cells(jnp.asarray(g), k=7)
    vols, _ = moments(cells)
    assert np.allclose(np.asarray(vols), 0.125, atol=1e-5)
