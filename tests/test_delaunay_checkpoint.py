"""DT3D Delaunay + checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.ops.delaunay import delaunay3d, voronoi_dual_edges


def _tet_vol(tets, P):
    a, b, c, d = P[tets[:, 0]], P[tets[:, 1]], P[tets[:, 2]], P[tets[:, 3]]
    return np.abs(np.einsum("ij,ij->i", a - d, np.cross(b - d, c - d))) / 6


def test_delaunay_matches_scipy():
    scipy_spatial = pytest.importorskip("scipy.spatial")
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (24, 3)).astype(np.float32)
    dt = delaunay3d(jnp.asarray(pts), jnp.ones(24, bool))
    ours = set(
        tuple(sorted(t))
        for t, v in zip(np.asarray(dt["tets"]), np.asarray(dt["tet_valid"]))
        if v
    )
    ref = set(
        tuple(sorted(t))
        for t in scipy_spatial.Delaunay(pts.astype(np.float64)).simplices
    )
    assert ours == ref


def test_delaunay_volume_fills_hull():
    rng = np.random.default_rng(9)
    pts = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    dt = delaunay3d(jnp.asarray(pts), jnp.ones(16, bool))
    valid = np.asarray(dt["tet_valid"])
    vol = _tet_vol(np.asarray(dt["tets"])[valid], pts).sum()
    from scipy.spatial import ConvexHull

    assert np.isclose(vol, ConvexHull(pts).volume, rtol=1e-4)


def test_delaunay_masked_points():
    rng = np.random.default_rng(5)
    pts = np.zeros((20, 3), np.float32)
    pts[:12] = rng.uniform(-1, 1, (12, 3))
    mask = np.arange(20) < 12
    dt = delaunay3d(jnp.asarray(pts), jnp.asarray(mask))
    tets = np.asarray(dt["tets"])[np.asarray(dt["tet_valid"])]
    assert (tets < 12).all()


def test_voronoi_dual_edges_nonempty():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    dt = delaunay3d(jnp.asarray(pts), jnp.ones(20, bool))
    edges, mask = voronoi_dual_edges(dt)
    assert int(mask.sum()) > 10
    e = np.asarray(edges)[np.asarray(mask)]
    assert np.isfinite(e).all()


def test_checkpoint_roundtrip(tmp_path):
    from surtr_tpu.checkpoint import load_scene, save_scene
    from surtr_tpu.config import FractureConfig, PhysicsConfig, SceneConfig
    from surtr_tpu.scene import Scene

    cfg = SceneConfig(
        fracture=FractureConfig(
            initial_decompose_cell_cnt=8, max_pieces=32, max_piece_tris=64,
            max_active_pieces=4, partial_pattern_cell_cnt=8,
            general_pattern_cell_cnt=8, voronoi_neighbors=7,
        ),
        physics=PhysicsConfig(broadphase_block=64),
    )
    sc = Scene("cube", cfg)
    sc.step(17)
    path = str(tmp_path / "snap.npz")
    save_scene(path, sc)
    sc2 = load_scene(path, cfg)
    assert np.array_equal(np.asarray(sc2.phys.bodies.x), np.asarray(sc.phys.bodies.x))
    assert sc2.num_pieces() == sc.num_pieces()
    # Resumed scene continues identically to the original.
    sc.step(10)
    sc2.step(10)
    assert np.allclose(
        np.asarray(sc.phys.bodies.x), np.asarray(sc2.phys.bodies.x), atol=1e-6
    )
