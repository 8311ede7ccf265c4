"""Batched multi-mesh fracture (BASELINE config 2) — single-chip lax.map and
multi-device shard_map variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.batch import batch_decompose, sharded_batch_decompose
from surtr_tpu.io.models import box, sphere_point_cloud

CFG = FractureConfig(
    initial_decompose_cell_cnt=8,
    max_pieces=16,
    max_piece_tris=64,
    voronoi_neighbors=7,
    partial_pattern_cell_cnt=4,
    general_pattern_cell_cnt=4,
)


def _inputs(M=8):
    v, f = box((2, 2, 2))
    verts = jnp.broadcast_to(jnp.asarray(v)[None], (M, len(v), 3))
    tc = jnp.broadcast_to(jnp.asarray(v[f])[None], (M, len(f), 3, 3))
    keys = jax.random.split(jax.random.PRNGKey(0), M)
    return (
        verts,
        jnp.ones((M, len(v)), bool),
        tc,
        jnp.ones((M, len(f)), bool),
        jnp.asarray(sphere_point_cloud()),
        keys,
    )


def test_batch_decompose_conserves_each_mesh():
    pieces, met = batch_decompose(*_inputs(4), CFG)
    assert pieces.valid.shape == (4, 16)
    assert np.allclose(np.asarray(met["total_volume"]), 8.0, rtol=1e-3)
    # Different keys → different decompositions.
    v0 = np.asarray(pieces.convex.face_verts[0])
    v1 = np.asarray(pieces.convex.face_verts[1])
    assert not np.array_equal(v0, v1)


@pytest.mark.slow  # shard_map equivalence: compile-heavy; `make test-all`
def test_sharded_batch_matches_unsharded():
    # No skip: conftest guarantees 8 CPU devices; fail loudly otherwise.
    devices = jax.devices("cpu")
    assert len(devices) >= 2, "conftest must provision virtual CPU devices"
    M = len(devices)
    args = _inputs(M)
    mesh = Mesh(np.asarray(devices), ("mesh",))
    sharded, total = sharded_batch_decompose("mesh", mesh, *args, CFG)
    local, met = batch_decompose(*args, CFG)
    assert int(total) == int(met["piece_cnt"].sum())
    # Raw arrays are compile-sensitive (a 1-ulp drift permutes the angular
    # cap ordering → identical geometry, different slot layout); compare
    # invariants instead: per-mesh piece counts and sorted fragment volumes.
    from surtr_tpu.ops.moments import moments

    assert np.array_equal(
        np.asarray(sharded.valid.sum(1)), np.asarray(local.valid.sum(1))
    )
    vs = np.sort(np.asarray(jnp.where(sharded.valid, moments(sharded.convex)[0], 0)), axis=1)
    vl = np.sort(np.asarray(jnp.where(local.valid, moments(local.convex)[0], 0)), axis=1)
    assert np.allclose(vs, vl, atol=1e-5)
