"""2-D Delaunay triangulation (Bowyer–Watson).

Capability parity with the reference's header-only ``DT`` (/root/reference/
Inc/DT.h:3-158): classic Bowyer–Watson with a super-triangle and circumcircle
tests (eps semantics per DT.h:99-106). Dead code in the reference's shipping
path, kept as a required capability (SURVEY §2.1 C8).

Same padded-table design as ops/delaunay.py, one dimension down.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 3.4e38


def circumcircle(tri_pts: jax.Array):
    """Circumcenter + squared radius. tri_pts: (..., 3, 2)."""
    a, b, c = tri_pts[..., 0, :], tri_pts[..., 1, :], tri_pts[..., 2, :]
    M = jnp.stack([b - a, c - a], axis=-2) * 2.0
    sq = lambda x: jnp.sum(x * x, axis=-1)
    rhs = jnp.stack([sq(b) - sq(a), sq(c) - sq(a)], axis=-1)
    det = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    ok = jnp.abs(det) > 1e-20
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    cx = (rhs[..., 0] * M[..., 1, 1] - rhs[..., 1] * M[..., 0, 1]) * inv_det
    cy = (rhs[..., 1] * M[..., 0, 0] - rhs[..., 0] * M[..., 1, 0]) * inv_det
    center = jnp.stack([cx, cy], axis=-1)
    r2 = jnp.where(ok, sq(center - a), -1.0)
    return center, r2


@functools.partial(jax.jit, static_argnames=("max_tris",))
def delaunay2d(points: jax.Array, mask: jax.Array, max_tris: int | None = None):
    """points: (N, 2) padded; mask: (N,). Returns dict with tris (T, 3) into
    an extended point array (last 3 rows = super-triangle) and tri_valid."""
    N = points.shape[0]
    big = jnp.asarray(BIG, points.dtype)
    m2 = mask[:, None]
    lo = jnp.min(jnp.where(m2, points, big), axis=0)
    hi = jnp.max(jnp.where(m2, points, -big), axis=0)
    center = (lo + hi) / 2
    scale = jnp.max(hi - lo) * 16.0 + 1.0
    sup = center + scale * jnp.asarray(
        [[-1.5, -1.0], [1.5, -1.0], [0.0, 1.8]], points.dtype
    )
    pts = jnp.concatenate([points, sup])

    T = max_tris if max_tris is not None else max(4 * N, 32)
    tris = jnp.zeros((T, 3), jnp.int32).at[0].set(
        jnp.asarray([N, N + 1, N + 2], jnp.int32)
    )
    valid = jnp.zeros((T,), bool).at[0].set(True)
    cc, r2 = circumcircle(pts[tris])

    edge_local = jnp.asarray([[0, 1], [1, 2], [0, 2]], jnp.int32)

    def insert(i, carry):
        tris, valid, cc, r2 = carry
        p = pts[i]
        do = mask[i]
        inside = valid & (jnp.sum((cc - p) ** 2, axis=1) <= r2) & do
        any_cav = jnp.any(inside)

        edges = jnp.sort(tris[:, edge_local], axis=-1).reshape(T * 3, 2)
        emask = jnp.repeat(inside, 3)
        same = (
            jnp.all(edges[:, None, :] == edges[None, :, :], axis=-1)
            & emask[None, :]
        )
        cnt = jnp.sum(same & emask[:, None], axis=1)
        boundary = emask & (cnt == 1)

        new_tri = jnp.concatenate(
            [edges, jnp.full((T * 3, 1), i, jnp.int32)], axis=1
        )
        valid_mid = valid & ~inside
        free_order = jnp.argsort(valid_mid)
        rank = jnp.cumsum(boundary.astype(jnp.int32)) - boundary.astype(jnp.int32)
        slot = free_order[jnp.minimum(rank, T - 1)]
        wr = boundary & any_cav
        tgt = jnp.where(wr, slot, T)
        tris2 = (
            jnp.zeros((T + 1, 3), jnp.int32)
            .at[:T].set(tris).at[tgt].set(new_tri, mode="drop")[:T]
        )
        valid2 = (
            jnp.zeros((T + 1,), bool)
            .at[:T].set(valid_mid).at[tgt].set(wr, mode="drop")[:T]
        )
        cc2, r22 = circumcircle(pts[tris2])
        keep = lambda new, old: jnp.where(any_cav, new, old)
        return keep(tris2, tris), keep(valid2, valid), keep(cc2, cc), keep(r22, r2)

    tris, valid, cc, r2 = jax.lax.fori_loop(0, N, insert, (tris, valid, cc, r2))
    touches_super = jnp.any(tris >= N, axis=1)
    return {
        "points": pts,
        "tris": tris,
        "tri_valid": valid & ~touches_super,
        "circumcenters": cc,
    }
