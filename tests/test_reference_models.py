"""End-to-end decomposition of real reference OBJ models (BASELINE config 1:
26-DOP hull approximation + convex decomposition of a loaded OBJ)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pipeline import prepare_fracture
from surtr_tpu.io.models import REFERENCE_ROOT, load_reference_model, sphere_point_cloud
from surtr_tpu.ops.moments import moments

needs_assets = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_ROOT, "Resources/Models")),
    reason="reference assets not mounted",
)


def _signed_volume(v, f):
    return float(
        np.einsum("ij,ij->i", v[f[:, 0]], np.cross(v[f[:, 1]], v[f[:, 2]])).sum()
        / 6.0
    )


@needs_assets
def test_bunny_decomposition_volume_bounds():
    """lowpoly-bunny (2503 verts): pieces must cover at least the mesh volume
    and stay below a loose ACH bound (ACH ⊇ mesh; fragments tile the ACH)."""
    v, f = load_reference_model("bunny")
    cfg = FractureConfig(
        initial_decompose_cell_cnt=8,
        max_pieces=24,
        max_piece_tris=2048,
        max_faces=48,
        max_face_verts=24,
        voronoi_neighbors=7,
        partial_pattern_cell_cnt=4,
        general_pattern_cell_cnt=4,
        max_islands=1,          # volume-bound assertions only (see pumpkin)
        island_grid_res=32,
        # Cap capacities sized for 8 big cells of a 5002-face model: each
        # cut face's cross-section carries O(100) boundary edges.
        cap_edges=96, cap_crossings=8, cap_tris=512, cap_pool=512,
        cap_edge_pool=768,
    )
    pieces, ctx, met = prepare_fracture(
        jnp.asarray(v),
        jnp.ones(len(v), bool),
        jnp.asarray(v[f]),
        jnp.ones(len(f), bool),
        jnp.asarray(sphere_point_cloud()),
        jax.random.PRNGKey(46354),
        cfg,
    )
    mesh_vol = _signed_volume(v, f)
    vols, _ = moments(pieces.convex)
    total = float(jnp.where(pieces.valid, vols, 0).sum())
    assert int(pieces.valid.sum()) >= 4
    assert total >= mesh_vol * 0.98
    # Exact caps (round 4, ops/caps.py): refit pools sit on the true solid,
    # so the convex total drops from the old refit-face-cap 1.705× to the
    # k-DOP-over-true-boundary 1.525× (the EXACT per-piece convex hulls
    # total 1.397× at this 8-cell config — a floor no convex decomposition
    # can beat; our tetra k-DOP is ~9% above it).
    assert total <= mesh_vol * 1.60
    # The capped visual meshes must enclose the model volume almost exactly
    # (measured 0.995× with exact caps; 0.967× with the legacy refit caps).
    capped = _capped_mesh_volume(pieces)
    assert abs(capped / mesh_vol - 1.0) <= 0.05
    # ICH face count is reported like the reference's FractureResult.
    assert 4 <= int(met["ich_face_cnt"]) <= 36


def _capped_mesh_volume(pieces):
    mt = np.asarray(pieces.mesh)
    mm = np.asarray(pieces.mesh_valid)
    val = np.asarray(pieces.valid)
    tot = 0.0
    for i in range(len(val)):
        if not val[i]:
            continue
        a, b, c = mt[i][:, 0], mt[i][:, 1], mt[i][:, 2]
        sv = np.einsum("ij,ij->i", a, np.cross(b, c)) / 6.0
        tot += float(sv[mm[i]].sum())
    return tot


@needs_assets
@pytest.mark.slow
def test_pumpkin_capped_mesh_volume_parity():
    """Near-convex model: the capped visual meshes must enclose the model
    volume almost exactly (measured 1.001× — PARITY.md divergence 1)."""
    v, f = load_reference_model("pumpkin")
    cfg = FractureConfig(
        initial_decompose_cell_cnt=8,
        max_pieces=24,
        max_piece_tris=4096,
        max_faces=48,
        max_face_verts=24,
        voronoi_neighbors=7,
        partial_pattern_cell_cnt=4,
        general_pattern_cell_cnt=4,
        # Volume assertions only: island splitting conserves volume and the
        # parity grid feeds only the island merge — run both cheap.
        max_islands=1,
        island_grid_res=32,
        # 8 big cells of a 10k-face model: long cross-section curves.
        cap_edges=128, cap_crossings=8, cap_tris=512, cap_pool=512,
    )
    pieces, ctx, met = prepare_fracture(
        jnp.asarray(v),
        jnp.ones(len(v), bool),
        jnp.asarray(v[f]),
        jnp.ones(len(f), bool),
        jnp.asarray(sphere_point_cloud()),
        jax.random.PRNGKey(46354),
        cfg,
    )
    mesh_vol = _signed_volume(v, f)
    cap_vol = _capped_mesh_volume(pieces)
    assert abs(cap_vol / mesh_vol - 1.0) < 0.03, cap_vol / mesh_vol
    vols, _ = moments(pieces.convex)
    total = float(jnp.where(pieces.valid, vols, 0).sum())
    assert 0.9 * mesh_vol <= total <= 1.1 * mesh_vol
