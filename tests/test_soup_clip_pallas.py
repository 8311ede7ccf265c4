"""Interpret-mode parity of the pooled Pallas soup-clip kernel against the
XLA clip_polys_by_rows path it replaces on TPU."""

import jax
import jax.numpy as jnp
import numpy as np

from surtr_tpu.ops.mesh_clip import clip_polys_by_rows, fan_triangles
from surtr_tpu.ops.soup_clip_pallas import soup_clip_pooled_pallas


def _random_case(seed, P=300, C=16, K=12, coplanar=False):
    rng = np.random.default_rng(seed)
    tris = rng.uniform(-1, 1, (P, 3, 3)).astype(np.float32)
    valid = rng.uniform(size=P) > 0.1
    # Grouped-by-cell ids (the pool invariant).
    cell = np.sort(rng.integers(0, C, P)).astype(np.int32)
    n = rng.normal(size=(C, K, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.uniform(-0.6, 0.6, (C, K, 1)).astype(np.float32)
    planes = np.concatenate([n, d], axis=-1)
    pmask = rng.uniform(size=(C, K)) > 0.15
    if coplanar:
        # Triangle 0 lies exactly in cell's plane 0 → exercises the
        # in-plane drop rule.
        c0 = int(cell[0])
        planes[c0, 0] = [0, 0, 1, 0]
        pmask[c0, 0] = True
        tris[0] = [[0.2, 0.0, 0.0], [0.0, 0.3, 0.0], [-0.2, -0.1, 0.0]]
        valid[0] = True
    return (
        jnp.asarray(tris), jnp.asarray(valid), jnp.asarray(cell),
        jnp.asarray(planes), jnp.asarray(pmask),
    )


def _compare(seed, **kw):
    tris, valid, cell, planes, pmask = _random_case(seed, **kw)
    C = planes.shape[0]
    pstart_np = np.searchsorted(np.asarray(cell), np.arange(C + 1))
    pstart = jnp.asarray(pstart_np.astype(np.int32))
    poly_x, nv_x, dr_x = clip_polys_by_rows(
        tris, valid, planes[cell], pmask[cell],
        seg_starts=pstart, seg_id=cell,
    )
    poly_p, nv_p, dr_p = soup_clip_pooled_pallas(
        tris, valid, cell, planes, pmask, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(nv_p), np.asarray(nv_x))
    S = poly_x.shape[1]
    mask = np.arange(S)[None, :] < np.asarray(nv_x)[:, None]
    np.testing.assert_allclose(
        np.asarray(poly_p) * mask[..., None],
        np.asarray(poly_x) * mask[..., None],
        atol=1e-5,
    )
    assert int(dr_p) == int(dr_x)
    # Fans derive from the polys — volume-bearing quantities carry over.
    _, fc_x = fan_triangles(poly_x, nv_x)
    _, fc_p = fan_triangles(poly_p, nv_p)
    np.testing.assert_array_equal(np.asarray(fc_p), np.asarray(fc_x))


def test_soup_clip_pallas_matches_xla_random():
    _compare(0)
    _compare(7)


def test_soup_clip_pallas_inplane_rule():
    _compare(3, coplanar=True)
