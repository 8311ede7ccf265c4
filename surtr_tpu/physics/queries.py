"""Scene queries — the replacement for PhysX raycast / sphere overlap used by
impact picking (/root/reference/Src/Surtr.cpp:178-254):
  * ``raycast``: nearest piece hit by a ray (gScene->raycast, Surtr.cpp:207;
    ConvexRayIntersection, Surtr.cpp:2460-2497);
  * ``sphere_overlap``: pieces overlapping the impact sphere of radius r/2
    (RadialMode overlap, Surtr.cpp:213-233).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surtr_tpu.physics.rigid import quat_to_mat
from surtr_tpu.physics.scene import PhysicsScene, piece_world_verts

BIG = 3.4e38


def _world_planes(scene: PhysicsScene):
    from surtr_tpu.ops.linalg import rot_points

    owner = jnp.clip(scene.piece_owner, 0, scene.B - 1)
    R = quat_to_mat(scene.bodies.q)[owner]
    x = scene.bodies.x[owner]
    n = rot_points(R, scene.piece_planes[..., :3])
    d = scene.piece_planes[..., 3] - jnp.sum(n * x[:, None, :], axis=-1)
    return n, d


def raycast(scene: PhysicsScene, origin: jax.Array, direction: jax.Array):
    """Slab-method ray vs every piece convex. Returns (piece_idx, t);
    piece_idx = -1 on miss."""
    n, d = _world_planes(scene)                           # (Np, F, 3), (Np, F)
    pm = scene.piece_pmask & scene.piece_valid[:, None]
    no = jnp.sum(n * origin, axis=-1) + d                 # s(origin)
    nd = jnp.sum(n * direction, axis=-1)
    t_hit = -no / jnp.where(jnp.abs(nd) > 1e-12, nd, 1e-12)
    # Entering faces (nd < 0): t_enter = max; exiting: t_exit = min.
    entering = nd < 0
    t_enter = jnp.max(
        jnp.where(pm & entering, t_hit, -BIG), axis=1
    )
    t_exit = jnp.min(jnp.where(pm & ~entering, t_hit, BIG), axis=1)
    # Ray misses if origin is outside a face it never crosses inward.
    outside_parallel = jnp.any(pm & (jnp.abs(nd) <= 1e-12) & (no > 0), axis=1)
    # A piece with no valid planes matches EVERY ray at t=0 (t_enter=-BIG,
    # t_exit=+BIG) — degenerate pieces must never report a hit.
    has_planes = jnp.any(pm, axis=1)
    hit = (
        scene.piece_valid
        & has_planes
        & (t_enter <= t_exit)
        & (t_exit > 0)
        & ~outside_parallel
    )
    t0 = jnp.where(t_enter > 0, t_enter, 0.0)
    t_best = jnp.where(hit, t0, BIG)
    idx = jnp.argmin(t_best)
    found = t_best[idx] < BIG / 2
    return jnp.where(found, idx, -1), jnp.where(found, t_best[idx], -1.0)


def sphere_overlap(scene: PhysicsScene, center: jax.Array, radius):
    """(Np,) bool — pieces whose convex intersects the sphere.

    Exact for convex pieces: max over faces of signed distance(center) ≤ r
    AND center's closest point... approximated as the reference does by
    plane distances + vertex proximity."""
    n, d = _world_planes(scene)
    pm = scene.piece_pmask & scene.piece_valid[:, None]
    s = jnp.sum(n * center, axis=-1) + d
    # If center is inside all planes → inside; else all plane distances ≤ r
    # is a (convex-conservative) overlap test. Plane-less (degenerate)
    # pieces must not read as "inside everything".
    maxs = jnp.max(jnp.where(pm, s, -BIG), axis=1)
    near = (maxs <= radius) & jnp.any(pm, axis=1)
    wv, wm = piece_world_verts(scene)
    vert_near = jnp.any(
        wm & (jnp.sum((wv - center) ** 2, -1) <= radius * radius), axis=1
    )
    return scene.piece_valid & (near | vert_near)


def body_of_piece(scene: PhysicsScene, piece_idx):
    return jnp.where(
        piece_idx >= 0, scene.piece_owner[jnp.maximum(piece_idx, 0)], -1
    )
