"""2-D Delaunay (component C8) vs scipy."""

import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.ops.delaunay2d import delaunay2d


def test_matches_scipy():
    scipy_spatial = pytest.importorskip("scipy.spatial")
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (30, 2)).astype(np.float32)
    dt = delaunay2d(jnp.asarray(pts), jnp.ones(30, bool))
    ours = set(
        tuple(sorted(t))
        for t, v in zip(np.asarray(dt["tris"]), np.asarray(dt["tri_valid"]))
        if v
    )
    ref = set(
        tuple(sorted(t))
        for t in scipy_spatial.Delaunay(pts.astype(np.float64)).simplices
    )
    assert ours == ref


def test_masked_points():
    rng = np.random.default_rng(4)
    pts = np.zeros((20, 2), np.float32)
    pts[:11] = rng.uniform(-1, 1, (11, 2))
    dt = delaunay2d(jnp.asarray(pts), jnp.asarray(np.arange(20) < 11))
    tris = np.asarray(dt["tris"])[np.asarray(dt["tri_valid"])]
    assert (tris < 11).all()
    assert len(tris) > 0
