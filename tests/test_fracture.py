"""Fracture-pipeline tests (SURVEY §4: fracture conserves total convex
volume; island labeling is a partition; seeded determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pipeline import (
    convex_out_of_sphere,
    do_fracture,
    prepare_fracture,
    split_groups_by_contact,
)
from surtr_tpu.fracture.types import PieceSet
from surtr_tpu.io.models import box, get_model, sphere_point_cloud
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import translate_poly, unit_cube

CFG = FractureConfig(
    initial_decompose_cell_cnt=16,
    max_pieces=128,
    max_faces=32,
    max_face_verts=16,
    max_piece_tris=128,
    max_active_pieces=8,
    partial_pattern_cell_cnt=32,
    general_pattern_cell_cnt=32,
    voronoi_neighbors=31,
)


def _prep(model="cube", cfg=CFG, seed=None):
    v, f = get_model(model)
    return prepare_fracture(
        jnp.asarray(v),
        jnp.ones(len(v), bool),
        jnp.asarray(v[f]),
        jnp.ones(len(f), bool),
        jnp.asarray(sphere_point_cloud()),
        jax.random.PRNGKey(seed if seed is not None else cfg.seed),
        cfg,
    )


def test_prepare_cube_conserves_volume():
    pieces, ctx, met = _prep("cube")
    vols, _ = moments(pieces.convex)
    total = float(jnp.where(pieces.valid, vols, 0).sum())
    # Model cube is 3x scaled box at extent 2 → edge 6?? get_model("cube") is
    # box((3,3,3)) → volume 27.
    assert np.isclose(total, 27.0, rtol=1e-3)
    assert int(pieces.valid.sum()) == 16
    assert set(np.asarray(pieces.group)[np.asarray(pieces.valid)]) == {0}
    assert float(ctx.max_axis_scale) == pytest.approx(3.0, rel=1e-5)


def test_prepare_is_seed_deterministic():
    p1, _, _ = _prep("cube")
    p2, _, _ = _prep("cube")
    assert np.array_equal(np.asarray(p1.convex.face_verts), np.asarray(p2.convex.face_verts))
    p3, _, _ = _prep("cube", seed=123)
    assert not np.array_equal(
        np.asarray(p1.convex.face_verts), np.asarray(p3.convex.face_verts)
    )


def test_prepare_nonconvex_volume_bounds():
    """Pieces cover at least the mesh volume and at most the ACH volume."""
    pieces, ctx, met = _prep("blob")
    vols, _ = moments(pieces.convex)
    total = float(jnp.where(pieces.valid, vols, 0).sum())
    v, f = get_model("blob")
    mesh_vol = float(
        np.einsum("ij,ij->i", v[f[:, 0]], np.cross(v[f[:, 1]], v[f[:, 2]])).sum() / 6
    )
    assert total >= mesh_vol * 0.95
    assert total <= mesh_vol * 1.6  # ACH of a blobby shape overshoots concavities


def test_do_fracture_conserves_volume_partial():
    pieces, ctx, _ = _prep("cube")
    impact = jnp.array([1.5, 1.5, 1.5])
    out, met = do_fracture(pieces, ctx, impact, 0, CFG, partial=True)
    vols, _ = moments(out.convex)
    total = float(jnp.where(out.valid, vols, 0).sum())
    assert np.isclose(total, 27.0, rtol=1e-3)
    assert int(met["new_pieces"]) > 0
    g = np.asarray(out.group)[np.asarray(out.valid)]
    assert (g >= 0).all()


def test_do_fracture_general_pattern():
    pieces, ctx, _ = _prep("cube")
    out, met = do_fracture(
        pieces, ctx, jnp.zeros(3), 0, CFG, partial=False
    )
    vols, _ = moments(out.convex)
    total = float(jnp.where(out.valid, vols, 0).sum())
    assert np.isclose(total, 27.0, rtol=1e-3)
    # General mode fractures every piece: nothing merges back.
    assert int(met["merged_out"]) == 0


def test_convex_out_of_sphere():
    cloud = jnp.asarray(sphere_point_cloud())
    cube = unit_cube()  # at origin, half-extent 0.5
    far = translate_poly(cube, jnp.array([10.0, 0, 0]))
    batch = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), cube, far
    )
    out = convex_out_of_sphere(batch, cloud * 1.0, jnp.zeros(3), 1.0)
    assert out.tolist() == [False, True]
    # Big convex containing the whole sphere but with no verts inside:
    big = jax.tree_util.tree_map(
        lambda a: a[None],
        translate_poly(unit_cube(), jnp.zeros(3)),
    )
    from surtr_tpu.types import scale_poly

    bigp = jax.tree_util.tree_map(lambda a: a[None], scale_poly(unit_cube(), 20.0))
    out2 = convex_out_of_sphere(bigp, cloud, jnp.zeros(3), 1.0)
    assert not bool(out2[0])  # cloud points are inside → not outside


def test_split_groups_by_contact_detects_separation():
    """Two cube pieces sharing a face stay one group; a detached third
    splits off."""
    a = unit_cube()
    b = translate_poly(unit_cube(), jnp.array([1.0, 0, 0]))   # touching +x face
    c = translate_poly(unit_cube(), jnp.array([5.0, 0, 0]))   # far away
    conv = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), a, b, c
    )
    P = 3
    pieces = PieceSet(
        convex=conv,
        mesh=jnp.zeros((P, 4, 3, 3)),
        mesh_valid=jnp.zeros((P, 4), bool),
        valid=jnp.ones((P,), bool),
        group=jnp.zeros((P,), jnp.int32),
        tag=jnp.full((P,), -1, jnp.int32),
    )
    out, _ = split_groups_by_contact(pieces, eps=1e-3)
    g = np.asarray(out.group)
    assert g[0] == g[1]
    assert g[2] != g[0]


def test_radial_pattern_cells_tile_exactly():
    """Regression: the clustered radial pattern needs all-pairs bisectors —
    k-nearest pruning produced overlapping cells (75% volume overcount)."""
    import jax as _jax

    from surtr_tpu.fracture.pattern import pattern_cells, radial_seeds

    seeds = radial_seeds(_jax.random.PRNGKey(46354), 128, 0.01)
    cells = pattern_cells(seeds, k=None, F=32, S=16)
    v, _ = moments(cells)
    assert np.isclose(float(v.sum()), 1.0, atol=2e-3)


@pytest.mark.slow  # config-variant of the conservation tests; `make test-all`
def test_medium_config_impact_conserves_volume():
    """Scene-level conservation through an impact (regression: an impact
    inflated 27 → 36 via overlapping pattern cells). Uses test_scene's
    shared CFG so the prepare/do_fracture programs hit the same jit +
    persistent cache (a bespoke config here alone cost ~3.5 min of CPU
    compile per cold run); the tiling bug class is covered at full pattern
    size by test_radial_pattern_cells_tile_exactly."""
    from tests.test_scene import CFG as SCENE_CFG
    from surtr_tpu.scene import Scene

    sc = Scene("cube", SCENE_CFG)
    sc.step(8)
    sc.fire_impact((0, 4.7, -10), (0, 0, 1))
    assert np.isclose(sc.total_volume(), 27.0, rtol=2e-3)


def test_fracture_pieces_are_convex():
    pieces, ctx, _ = _prep("cube")
    out, _ = do_fracture(pieces, ctx, jnp.array([1.5, 0.0, 0.0]), 0, CFG)
    fv = np.asarray(out.convex.face_verts)
    nv = np.asarray(out.convex.n_verts)
    pl = np.asarray(out.convex.planes)
    valid = np.asarray(out.valid)
    scale = float(ctx.max_axis_scale)
    for p in np.nonzero(valid)[0][:8]:
        for g in range(out.convex.F):
            if nv[p, g] < 3:
                continue
            for f in range(out.convex.F):
                if nv[p, f] < 3:
                    continue
                s = fv[p, f, : nv[p, f]] @ pl[p, g, :3] + pl[p, g, 3]
                assert (s < 1e-3 * scale).all()


def test_exact_face_overlap_splits_laterally_offset_pieces():
    """VERDICT r1 item 7: two pieces whose cut faces are coplanar/opposite
    but laterally offset (no 2-D overlap) must split under the exact test;
    the bounding-sphere proxy over-connects them."""
    from surtr_tpu.fracture.types import PieceSet
    from surtr_tpu.types import unit_cube

    # Unit cubes side by side along x sharing the plane x=0.5, but offset
    # 1.2 in y: face centers 1.2 apart, sphere radii ~0.707 each → spheres
    # overlap, polygons don't.
    polys = [
        translate_poly(unit_cube(), jnp.asarray([0.0, 0.0, 0.0])),
        translate_poly(unit_cube(), jnp.asarray([1.0, 1.2, 0.0])),
    ]
    conv = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *polys)
    pieces = PieceSet(
        conv,
        jnp.zeros((2, 4, 3, 3)),
        jnp.zeros((2, 4), bool),
        jnp.ones((2,), bool),
        jnp.zeros((2,), jnp.int32),       # same compound
        jnp.full((2,), -1, jnp.int32),
    )
    loose, _ = split_groups_by_contact(pieces, eps=1e-3, exact=False)
    strict, _ = split_groups_by_contact(pieces, eps=1e-3, exact=True)
    lg = np.asarray(loose.group)[np.asarray(loose.valid)]
    sg = np.asarray(strict.group)[np.asarray(strict.valid)]
    assert len(set(lg.tolist())) == 1, lg    # sphere proxy keeps them glued
    assert len(set(sg.tolist())) == 2, sg    # exact overlap splits

    # Control: actually touching pieces stay glued under the exact test too.
    polys2 = [
        translate_poly(unit_cube(), jnp.asarray([0.0, 0.0, 0.0])),
        translate_poly(unit_cube(), jnp.asarray([1.0, 0.3, 0.0])),
    ]
    conv2 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *polys2)
    pieces2 = PieceSet(
        conv2,
        jnp.zeros((2, 4, 3, 3)),
        jnp.zeros((2, 4), bool),
        jnp.ones((2,), bool),
        jnp.zeros((2,), jnp.int32),
        jnp.full((2,), -1, jnp.int32),
    )
    s2, _ = split_groups_by_contact(pieces2, eps=1e-3, exact=True)
    g2 = np.asarray(s2.group)[np.asarray(s2.valid)]
    assert len(set(g2.tolist())) == 1, g2
