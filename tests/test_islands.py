"""Mesh-island splitting inside do_fracture (CheckMeshIsland semantics)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pipeline import do_fracture, prepare_fracture
from surtr_tpu.fracture.types import FractureContext, PieceSet
from surtr_tpu.io.models import box, sphere_point_cloud
from surtr_tpu.fracture.pattern import pattern_cells, uniform_seeds
from surtr_tpu.types import scale_poly, unit_cube


def test_disconnected_mesh_splits_into_islands():
    """A piece whose visual mesh is two disjoint chunks becomes two pieces
    (sharing the convex) that land in different compounds."""
    cfg = FractureConfig(
        initial_decompose_cell_cnt=4,
        max_pieces=32,
        max_piece_tris=64,
        max_active_pieces=2,
        partial_pattern_cell_cnt=2,
        general_pattern_cell_cnt=2,
        voronoi_neighbors=3,
        max_islands=2,
        partial_fracture=False,
    )
    F, S, T = cfg.max_faces, cfg.max_face_verts, cfg.max_piece_tris

    # One piece: convex = big box spanning both chunks; mesh = two small
    # boxes at x = ±2.
    big = scale_poly(unit_cube(F=F, S=S), jnp.array([6.0, 1.0, 1.0]))
    v1, f1 = box((1, 1, 1), center=(-2, 0, 0))
    v2, f2 = box((1, 1, 1), center=(2, 0, 0))
    tris = np.concatenate([v1[f1], v2[f2]])
    mesh = np.zeros((T, 3, 3), np.float32)
    mesh[: len(tris)] = tris
    mmask = np.zeros(T, bool)
    mmask[: len(tris)] = True

    P = cfg.max_pieces
    pieces = PieceSet(
        convex=jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a[None], jnp.zeros((P - 1,) + a.shape, a.dtype)]
            ),
            big,
        ),
        mesh=jnp.asarray(np.concatenate([mesh[None], np.zeros((P - 1, T, 3, 3), np.float32)])),
        mesh_valid=jnp.asarray(np.concatenate([mmask[None], np.zeros((P - 1, T), bool)])),
        valid=jnp.zeros((P,), bool).at[0].set(True),
        group=jnp.full((P,), -1, jnp.int32).at[0].set(0),
        tag=jnp.full((P,), -1, jnp.int32),
    )
    # Pattern with 2 huge cells (scaled ×2·mas they cover everything).
    seeds = jnp.asarray([[-0.25, 0, 0], [0.25, 0, 0]], jnp.float32)
    pat = pattern_cells(seeds, k=None, F=F, S=S)
    ctx = FractureContext(
        bb_center=jnp.zeros(3),
        bb_min=jnp.array([-3.0, -0.5, -0.5]),
        bb_max=jnp.array([3.0, 0.5, 0.5]),
        max_axis_scale=jnp.asarray(6.0),
        partial_pattern=pat,
        general_pattern=pat,
        sphere_cloud=jnp.asarray(sphere_point_cloud()),
    )
    out, met = do_fracture(
        pieces, ctx, jnp.zeros(3), 0, cfg, partial=False
    )
    valid = np.asarray(out.valid)
    groups = np.asarray(out.group)[valid]
    meshes = np.asarray(out.mesh_valid)[valid]
    centers = []
    for i in range(valid.sum()):
        tri = np.asarray(out.mesh)[valid][i][meshes[i]]
        if len(tri):
            centers.append(tri.reshape(-1, 3).mean(0)[0])
    # The two chunks ended up in different pieces AND different groups.
    assert len(set(groups.tolist())) >= 2
    assert any(c < -1 for c in centers) and any(c > 1 for c in centers)


@pytest.mark.slow
def test_islands_disabled_keeps_single_piece():
    cfg_kwargs = dict(
        initial_decompose_cell_cnt=8,
        max_pieces=64,
        max_piece_tris=96,
        max_active_pieces=4,
        partial_pattern_cell_cnt=8,
        general_pattern_cell_cnt=8,
        voronoi_neighbors=7,
    )
    v, f = box((2, 2, 2))
    cloud = jnp.asarray(sphere_point_cloud())
    for isl in (1, 2):
        cfg = FractureConfig(max_islands=isl, **cfg_kwargs)
        pieces, ctx, _ = prepare_fracture(
            jnp.asarray(v), jnp.ones(len(v), bool), jnp.asarray(v[f]),
            jnp.ones(len(f), bool), cloud, jax.random.PRNGKey(1), cfg,
        )
        out, met = do_fracture(pieces, ctx, jnp.array([1.0, 1.0, 1.0]), 0, cfg)
        # Convex cube fragments never split into islands: totals match.
        from surtr_tpu.ops.moments import moments

        vols, _ = moments(out.convex)
        total = float(jnp.where(out.valid, vols, 0).sum())
        assert np.isclose(total, 8.0, rtol=2e-3), (isl, total)


def test_torus_through_cut_two_compounds():
    """VERDICT r1 item 5 e2e: a slab cell through a torus captures two
    disjoint tube arcs → two pieces in two different compounds, and the
    survivors' mesh centroids sit on opposite sides of the ring."""
    from surtr_tpu.io.models import _torus

    cfg = FractureConfig(
        initial_decompose_cell_cnt=4,
        max_pieces=32,
        max_piece_tris=320,
        max_active_pieces=2,
        partial_pattern_cell_cnt=2,
        general_pattern_cell_cnt=2,
        voronoi_neighbors=3,
        max_islands=2,
        partial_fracture=False,
    )
    F, S, T = cfg.max_faces, cfg.max_face_verts, cfg.max_piece_tris

    v, f = _torus(R=1.2, r=0.4, nu=16, nv=8)
    tris = v[f]
    mesh = np.zeros((T, 3, 3), np.float32)
    mesh[: len(tris)] = tris
    mmask = np.zeros(T, bool)
    mmask[: len(tris)] = True

    big = scale_poly(unit_cube(F=F, S=S), jnp.array([3.6, 1.2, 3.6]))
    P = cfg.max_pieces
    pieces = PieceSet(
        convex=jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a[None], jnp.zeros((P - 1,) + a.shape, a.dtype)]
            ),
            big,
        ),
        mesh=jnp.asarray(
            np.concatenate([mesh[None], np.zeros((P - 1, T, 3, 3), np.float32)])
        ),
        mesh_valid=jnp.asarray(
            np.concatenate([mmask[None], np.zeros((P - 1, T), bool)])
        ),
        valid=jnp.zeros((P,), bool).at[0].set(True),
        group=jnp.full((P,), -1, jnp.int32).at[0].set(0),
        tag=jnp.full((P,), -1, jnp.int32),
    )
    # 3 seeds along x; scaled ×2·mas(=4) the bisectors sit at x = ±0.6:
    # the middle slab crosses the ring twice (arcs near z ≈ ±1.1).
    seeds = jnp.asarray([[-0.3, 0, 0], [0.0, 0, 0], [0.3, 0, 0]], jnp.float32)
    pat = pattern_cells(seeds, k=None, F=F, S=S)
    ctx = FractureContext(
        bb_center=jnp.zeros(3),
        bb_min=jnp.array([-1.8, -0.6, -1.8]),
        bb_max=jnp.array([1.8, 0.6, 1.8]),
        max_axis_scale=jnp.asarray(2.0),
        partial_pattern=pat,
        general_pattern=pat,
        sphere_cloud=jnp.asarray(sphere_point_cloud()),
    )
    out, met = do_fracture(pieces, ctx, jnp.zeros(3), 0, cfg, partial=False)
    valid = np.asarray(out.valid)
    groups = np.asarray(out.group)[valid]
    meshes = np.asarray(out.mesh_valid)[valid]
    mesh_all = np.asarray(out.mesh)[valid]
    # Mid-slab pieces: mesh centroid near x=0; they must split by z sign and
    # land in different groups.
    mid_groups_pos, mid_groups_neg = set(), set()
    for i in range(int(valid.sum())):
        tri = mesh_all[i][meshes[i]]
        if not len(tri):
            continue
        c = tri.reshape(-1, 3).mean(0)
        if abs(c[0]) < 0.45:
            (mid_groups_pos if c[2] > 0 else mid_groups_neg).add(
                int(groups[i])
            )
    assert mid_groups_pos and mid_groups_neg
    assert mid_groups_pos.isdisjoint(mid_groups_neg), (
        mid_groups_pos, mid_groups_neg,
    )
    # At least 4 compounds in total (two side cells + two mid arcs).
    assert len(set(groups.tolist())) >= 4


def test_u_shape_patches_stay_one_piece():
    """PARITY divergence 3 / VERDICT r2 item 9: two surface patches joined
    through material AROUND A BEND (U-shape) must stay one piece — the
    straight centroid segment exits the material, but the voxel
    connectivity test follows the bend (the reference labels the closed
    clipped polyhedron, Surtr.cpp:2157-2201, which keeps them joined)."""
    import dataclasses

    from surtr_tpu.fracture.pipeline import _split_mesh_islands

    cfg = FractureConfig(
        max_islands=2, island_pool=4, max_piece_tris=64, island_voxel_res=8
    )
    T = cfg.max_piece_tris

    # U solid: two legs + a bottom bar (overlapping closed boxes; the
    # winding number handles the union).
    parts = [
        box((1, 2.4, 1), center=(-1, 1.8, 0.5)),   # left leg  y∈[0.6, 3]
        box((1, 2.4, 1), center=(1, 1.8, 0.5)),    # right leg
        box((3, 1.0, 1), center=(0, 0.5, 0.5)),    # bottom    y∈[0, 1]
    ]
    solid = np.concatenate([v[f] for v, f in parts]).astype(np.float32)
    Ts = len(solid)

    # Candidate surface: just the two leg TOP faces (disconnected patches).
    def quad(x0, x1, y, z0, z1):
        a, b, c, d = (
            [x0, y, z0], [x1, y, z0], [x1, y, z1], [x0, y, z1]
        )
        return np.asarray([[a, b, c], [a, c, d]], np.float32)

    patches = np.concatenate(
        [quad(-1.5, -0.5, 3.0, 0.0, 1.0), quad(0.5, 1.5, 3.0, 0.0, 1.0)]
    )
    mtris = np.zeros((T, 3, 3), np.float32)
    mtris[: len(patches)] = patches
    mmask = np.zeros(T, bool)
    mmask[: len(patches)] = True

    conv = scale_poly(unit_cube(F=cfg.max_faces, S=cfg.max_face_verts),
                      jnp.array([4.0, 4.0, 2.0]))
    from surtr_tpu.types import translate_poly

    conv = translate_poly(conv, jnp.array([0.0, 1.5, 0.5]))
    batch = lambda a: jnp.asarray(a)[None]
    conv_b = jax.tree_util.tree_map(lambda a: a[None], conv)
    solid_b = batch(solid)
    solid_m = jnp.ones((1, Ts), bool)

    mmask0, x_cand, x_mmask, x_valid = _split_mesh_islands(
        conv_b, batch(mtris), batch(mmask), solid_b, solid_m,
        jnp.asarray(4.0), cfg,
    )
    # merged: primary keeps ALL patch triangles, no pool entries
    assert not bool(np.any(np.asarray(x_valid)))
    assert np.array_equal(np.asarray(mmask0[0]), mmask)

    # Negative control: voxel test off → the straight-segment probes alone
    # wrongly split the U (this is exactly the divergence being fixed).
    cfg0 = dataclasses.replace(cfg, island_voxel_res=0)
    _, _, _, x_valid0 = _split_mesh_islands(
        conv_b, batch(mtris), batch(mmask), solid_b, solid_m,
        jnp.asarray(4.0), cfg0,
    )
    assert bool(np.any(np.asarray(x_valid0)))
