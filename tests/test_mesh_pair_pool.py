"""Equivalence of the pair-pool mesh clip against the per-cell uniform-pool
clip it replaces (model-scale path: cull_cap < Tsrc forces the culled
branch; cfg.mesh_pair_pool switches the two implementations)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pipeline import prepare_fracture
from surtr_tpu.io.models import sphere_point_cloud
from tests.test_reference_models import load_reference_model


def test_pair_pool_matches_per_cell_clip():
    v, f = load_reference_model("bunny")
    base = FractureConfig(
        initial_decompose_cell_cnt=16,
        max_pieces=32,
        max_piece_tris=256,      # forces cull_cap < Tsrc (the culled branch)
        max_faces=48,
        max_face_verts=24,
        voronoi_neighbors=7,
        partial_pattern_cell_cnt=4,
        general_pattern_cell_cnt=4,
        max_islands=1,           # identical candidate sets either way
    )
    assert min(len(f), max(4 * base.max_piece_tris,
                           -(-6 * len(f) // 16))) < len(f)
    args = (
        jnp.asarray(v), jnp.ones(len(v), bool), jnp.asarray(v[f]),
        jnp.ones(len(f), bool), jnp.asarray(sphere_point_cloud()),
        jax.random.PRNGKey(46354),
    )
    outs = {}
    for pool in (True, False):
        cfg = dataclasses.replace(base, mesh_pair_pool=pool)
        pieces, ctx, met = prepare_fracture(*args, cfg)
        outs[pool] = (pieces, met)

    a, ma = outs[True]
    b, mb = outs[False]
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    # The two implementations are algorithmically identical but broadcast
    # the plane differently (per-row vs shared scalar), so XLA partitions
    # the fp ops differently and a triangle lying within ±tol of a bisector
    # can classify either way (measured: 3 of 8192 slots under the 8-device
    # CPU env, 0 single-device). Compare boundary-tolerant invariants: the
    # kept-triangle counts and the kept surface AREA per piece.
    ca = np.asarray(a.mesh_valid).sum(1)
    cb = np.asarray(b.mesh_valid).sum(1)
    assert np.abs(ca - cb).sum() <= 6, (ca, cb)

    def areas(p):
        m = np.asarray(p.mesh)
        v = np.asarray(p.mesh_valid)
        cr = np.cross(m[:, :, 1] - m[:, :, 0], m[:, :, 2] - m[:, :, 0])
        return (0.5 * np.linalg.norm(cr, axis=-1) * v).sum(1)

    aa, ab = areas(a), areas(b)
    np.testing.assert_allclose(aa, ab, rtol=2e-3, atol=1e-4)
    da = int(np.asarray(ma["mesh_tris_dropped"]).sum())
    db = int(np.asarray(mb["mesh_tris_dropped"]).sum())
    assert abs(da - db) <= 16, (da, db)
