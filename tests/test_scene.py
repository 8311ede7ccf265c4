"""End-to-end scene tests: the interactive loop (impact → refracture →
settle), velocity transfer, and rendering."""

import numpy as np
import pytest

from surtr_tpu.config import FractureConfig, PhysicsConfig, RenderConfig, SceneConfig
from surtr_tpu.scene import Scene
CFG = SceneConfig(
    fracture=FractureConfig(
        initial_decompose_cell_cnt=12,
        max_pieces=96,
        max_faces=32,
        max_face_verts=16,
        max_piece_tris=96,
        max_active_pieces=8,
        partial_pattern_cell_cnt=24,
        general_pattern_cell_cnt=24,
        voronoi_neighbors=23,
    ),
    physics=PhysicsConfig(broadphase_block=128),
    render=RenderConfig(width=96, height=96, shadow_size=128),
)


@pytest.fixture(scope="module")
def scene():
    return Scene("cube", CFG)


def test_scene_init(scene):
    assert scene.num_bodies() == 1
    assert scene.num_pieces() == 12
    assert np.isclose(scene.total_volume(), 27.0, rtol=1e-3)


def test_interactive_impact_loop():
    sc = Scene("cube", CFG)
    v0 = sc.total_volume()
    sc.step(12)
    out = sc.fire_impact((0, 4.5, -10), (0, 0, 1))
    assert out["targets"] == [0]
    assert sc.num_bodies() > 1
    assert np.isclose(sc.total_volume(), v0, rtol=1e-3)
    sc.step(24)
    ys = sc.positions()[np.asarray(sc.phys.bodies.active), 1]
    assert (ys > -2.1).all()  # nothing fell through the ground
    # Recursive refracture on a fragment.
    out2 = sc.fire_impact((0, 3.0, -10), (0, 0, 1))
    if out2:  # may miss if fragments scattered
        assert np.isclose(sc.total_volume(), v0, rtol=1e-3)


def test_miss_returns_empty():
    sc = Scene("cube", CFG)
    out = sc.fire_impact((100, 100, 100), (0, 1, 0))
    assert out == {}
    assert sc.num_bodies() == 1


def test_velocity_transfer_untouched_bodies():
    sc = Scene("cube", CFG)
    sc.step(45)  # build up fall velocity
    vy_before = float(sc.phys.bodies.v[0, 1])
    assert vy_before < -1.0
    sc.fire_impact((0, 4.0, -10), (0, 0, 1))
    act = np.asarray(sc.phys.bodies.active)
    tags = np.asarray(sc.pieces.tag)
    groups = np.asarray(sc.pieces.group)
    valid = np.asarray(sc.pieces.valid)
    vys = np.asarray(sc.phys.bodies.v[:, 1])
    # The parent compound (tagged pieces) keeps its fall velocity.
    parent_groups = set(groups[valid & (tags >= 0)].tolist())
    fresh_groups = set(groups[valid & (tags < 0)].tolist()) - parent_groups
    assert any(abs(vys[g] - vy_before) < 0.5 for g in parent_groups)
    # Fresh fragments spawn at rest (reference parity, Surtr.cpp:2507).
    for g in fresh_groups:
        assert abs(vys[g]) < 1e-6


def test_render_produces_geometry(scene):
    img = np.asarray(scene.render())
    assert img.shape == (96, 96, 3)
    bg = np.array([0.12, 0.15, 0.18])
    nonbg = (np.abs(img - bg).sum(-1) > 0.01).sum()
    assert nonbg > 96 * 96 * 0.2  # ground + cube cover a decent area
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_fused_interactive_frame():
    """VERDICT r2 item 6: the whole interactive loop — raycast, radial
    refracture, rebuild + velocity transfer, physics step, shadow-mapped
    render — as ONE jitted dispatch (the reference's Tick is one loop,
    Surtr.cpp:123-131)."""
    import dataclasses

    from surtr_tpu.config import RenderConfig

    cfg = dataclasses.replace(
        CFG, render=RenderConfig(width=48, height=48, shadow_size=32)
    )
    sc = Scene("cube", cfg)
    n0 = sc.num_pieces()
    v0 = sc.total_volume()
    img, met = sc.interactive_frame((0.0, 10.0, 0.0), (0.0, -1.0, 0.0))
    assert img.shape == (48, 48, 3)
    assert sc.num_pieces() > n0          # the impact fractured the compound
    assert abs(sc.total_volume() - v0) < 1e-2 * v0
    # a missing ray degrades to step+render (no new pieces)
    n1 = sc.num_pieces()
    img2, _ = sc.interactive_frame((100.0, 50.0, 0.0), (0.0, 1.0, 0.0))
    assert img2.shape == (48, 48, 3)
    assert sc.num_pieces() == n1
