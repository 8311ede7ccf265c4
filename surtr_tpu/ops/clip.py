"""Convex polytope clipping against half-spaces.

The replacement for the reference's clipping workhorses:
  * ``Poly::ClipPolyhedron`` (/root/reference/Src/Poly.cpp:265-554) — in-place
    vertex-adjacency surgery over a plane list, and
  * ``VMACH::Polygon3D::ClipWithPlane`` (/root/reference/Src/VMACH.cpp:550-851)
    — face clipping with sequential cut-edge chaining for the cap face.

TPU-first redesign (DESIGN.md): faces are clipped *independently* by a masked,
vectorized Sutherland–Hodgman pass (no cross-face dependency), and the cap face
is reconstructed by *angular sorting* of the cut points — valid because every
polytope on this path is convex. A multi-plane clip is a ``lax.scan`` fold; a
batch of polytopes is a ``vmap``.

Sign convention: plane (n, d), signed distance s(x) = n·x + d, the KEPT side is
s(x) < 0 (reference: ComparePlanePoint, Poly.cpp:716-723). Points with
|s| <= tol count as kept/in-plane (reference comp == 0).

Determinism note: the edge/plane intersection formula
``(a·s_b − b·s_a)/(s_b − s_a)`` (reference: PlaneLineIntersection,
Poly.cpp:746-751) is sign-symmetric — swapping (a, b) negates both numerator
and denominator — so the two faces sharing an edge produce bitwise-identical
cut points, which the cap deduplication relies on. This replaces the
reference's string-hash endpoint ordering (VMACH.cpp:63-76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from surtr_tpu.types import ConvexPoly

DEFAULT_TOL = 1e-6


def _exclusive_cumsum(x: jax.Array, axis: int = -1) -> jax.Array:
    c = jnp.cumsum(x, axis=axis)
    return c - x


def plane_basis(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Deterministic orthonormal basis (u, v) with u × v = n (n unit)."""
    # Pick the coordinate axis least aligned with n.
    a = jnp.abs(n)
    axis = jnp.argmin(a)
    e = jnp.zeros((3,), n.dtype).at[axis].set(1.0)
    u = jnp.cross(e, n)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
    v = jnp.cross(n, u)
    return u, v


def clip_poly_plane(
    poly: ConvexPoly, plane: jax.Array, tol: float = DEFAULT_TOL
) -> ConvexPoly:
    """Clip one convex polytope by one plane, keeping the n·x + d < 0 side.

    Shapes are static: input (F, S), output (F, S). The cap face (the closure
    of the cut, reference VMACH.cpp:699-813) is written into the first free
    face slot; if no slot is free the cap is dropped (counted by callers that
    care via ``clip_overflow``).
    """
    F, S = poly.F, poly.S
    fv = poly.face_verts          # (F, S, 3)
    nv = poly.n_verts             # (F,)
    n = plane[:3]
    d = plane[3]

    slot = jnp.arange(S, dtype=jnp.int32)
    m = slot[None, :] < nv[:, None]                      # (F, S) valid slots
    # Elementwise mul+sum (VPU) rather than a matvec: keeps full f32 on TPU.
    dist = jnp.sum(fv * n, axis=-1) + d                  # (F, S)
    # Next index around each loop (per-face count).
    nxt = jnp.where(slot[None, :] + 1 < nv[:, None], slot[None, :] + 1, 0)
    v_next = jnp.take_along_axis(fv, nxt[:, :, None], axis=1)   # (F, S, 3)
    d_next = jnp.take_along_axis(dist, nxt, axis=1)             # (F, S)

    kept = m & (dist <= tol)
    cross = m & (
        ((dist < -tol) & (d_next > tol)) | ((dist > tol) & (d_next < -tol))
    )
    # Symmetric intersection: p = (a*s_b - b*s_a) / (s_b - s_a).
    denom = d_next - dist
    safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    p_cut = (fv * d_next[:, :, None] - v_next * dist[:, :, None]) / safe[:, :, None]

    # --- Sutherland–Hodgman emission: per slot emit [v if kept][p if cross].
    flags = jnp.stack([kept, cross], axis=-1).reshape(F, 2 * S)          # (F, 2S)
    vals = jnp.stack([fv, p_cut], axis=-2).reshape(F, 2 * S, 3)          # (F, 2S, 3)
    tgt = _exclusive_cumsum(flags.astype(jnp.int32), axis=-1)            # (F, 2S)
    n_out = jnp.sum(flags, axis=-1).astype(jnp.int32)                    # (F,)
    # Flattened scatter with drop semantics for overflow / unflagged slots.
    row = jnp.arange(F, dtype=jnp.int32)[:, None]
    flat = jnp.where(flags & (tgt < S), row * S + tgt, F * S)
    out_fv = (
        jnp.zeros((F * S + 1, 3), fv.dtype)
        .at[flat.reshape(-1)]
        .set(vals.reshape(-1, 3), mode="drop")[: F * S]
        .reshape(F, S, 3)
    )
    n_out = jnp.minimum(n_out, S)
    new_nv = jnp.where(n_out >= 3, n_out, 0)

    # --- Cap face: points ON the plane, angularly sorted around their
    # centroid. Two sources: edge/plane crossings, and pre-existing vertices
    # lying exactly in-plane (|s| <= tol) on faces that lost a vertex — the
    # analogue of the reference's comp == 0 vertices being linked into the
    # cap loops (Poly.cpp:369-427). Without the latter, a cut passing through
    # a vertex leaves a notch in the cap.
    removed = m & (dist > tol)
    face_touched = jnp.any(removed, axis=1)                              # (F,)
    inplane = m & (jnp.abs(dist) <= tol) & face_touched[:, None]
    any_removed = jnp.any(removed)
    cand = (cross | inplane) & any_removed                               # (F, S)
    cand_pts = jnp.where(cross[..., None], p_cut, fv)                    # (F, S, 3)
    # A convex face contributes at most 2 cap points (3 slots for safety in
    # tangency cases); compacting to (F, 3) keeps the angular sort small —
    # sorting the full (F·S) pool dominated TPU time.
    CAPS = 3
    rank = jnp.cumsum(cand.astype(jnp.int32), axis=1) - cand.astype(jnp.int32)
    keep_c = cand & (rank < CAPS)
    row = jnp.arange(F, dtype=jnp.int32)[:, None]
    cidx = jnp.where(keep_c, row * CAPS + rank, F * CAPS)
    pool = (
        jnp.zeros((F * CAPS + 1, 3), fv.dtype)
        .at[cidx.reshape(-1)]
        .set(cand_pts.reshape(-1, 3), mode="drop")[: F * CAPS]
    )
    pool_mask = (
        jnp.zeros((F * CAPS + 1,), bool)
        .at[cidx.reshape(-1)]
        .set(keep_c.reshape(-1), mode="drop")[: F * CAPS]
    )
    cap_mask = pool_mask                                                 # (3F,)
    cap_pts = pool
    cnt = jnp.sum(cap_mask)
    wsum = jnp.sum(jnp.where(cap_mask[:, None], cap_pts, 0.0), axis=0)
    centroid = wsum / jnp.maximum(cnt, 1)
    u, v = plane_basis(n / jnp.maximum(jnp.linalg.norm(n), 1e-30))
    rel = cap_pts - centroid
    ang = jnp.arctan2(jnp.sum(rel * v, -1), jnp.sum(rel * u, -1))
    key = jnp.where(cap_mask, ang, jnp.inf)
    order = jnp.argsort(key)
    sorted_pts = cap_pts[order]
    sorted_mask = cap_mask[order]
    # Duplicates (crossing points are bitwise identical across the two faces
    # sharing the edge; in-plane vertices are exact copies across faces) sort
    # adjacently — keep the first of each equal run.
    prev = jnp.roll(sorted_pts, 1, axis=0).at[0].set(jnp.inf)
    dup = jnp.all(sorted_pts == prev, axis=-1)
    keep = sorted_mask & ~dup
    n_cap = jnp.sum(keep).astype(jnp.int32)
    ctgt = _exclusive_cumsum(keep.astype(jnp.int32))
    cap_fv = (
        jnp.zeros((S + 1, 3), fv.dtype)
        .at[jnp.where(keep & (ctgt < S), ctgt, S)]
        .set(sorted_pts, mode="drop")[:S]
    )
    n_cap = jnp.minimum(n_cap, S)
    has_cap = n_cap >= 3

    # Write cap into the first free slot (n_verts == 0), if any.
    free = new_nv == 0
    cap_slot = jnp.argmax(free)                       # first free slot (or 0)
    can_place = has_cap & jnp.any(free)
    new_fv = jnp.where(
        can_place,
        out_fv.at[cap_slot].set(cap_fv),
        out_fv,
    )
    new_nv = jnp.where(can_place, new_nv.at[cap_slot].set(n_cap), new_nv)
    new_planes = jnp.where(
        can_place,
        poly.planes.at[cap_slot].set(plane),
        poly.planes,
    )

    # Degenerate polytope (fewer than 4 faces) is cleared — the analogue of the
    # reference's `polyhedron.size() < 4` wipe (Poly.cpp:506-507).
    alive = jnp.sum((new_nv >= 3).astype(jnp.int32)) >= 4
    new_nv = jnp.where(alive, new_nv, 0)

    return ConvexPoly(new_fv, new_nv, new_planes)


def clip_poly_planes(
    poly: ConvexPoly,
    planes: jax.Array,
    plane_mask: jax.Array | None = None,
    tol: float = DEFAULT_TOL,
) -> ConvexPoly:
    """Fold ``clip_poly_plane`` over a (K, 4) plane list with a validity mask.

    The analogue of the reference's plane loop in Poly::ClipPolyhedron
    (Poly.cpp:291-300) — but as a ``lax.scan`` so it stays inside one jit.
    """
    K = planes.shape[0]
    if plane_mask is None:
        plane_mask = jnp.ones((K,), bool)

    def body(p, xs):
        plane, ok = xs
        q = clip_poly_plane(p, plane, tol)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(ok, (1,) * a.ndim), b, a
            ),
            p,
            q,
        )
        return out, None

    out, _ = jax.lax.scan(body, poly, (planes, plane_mask))
    return out


def clip_poly_poly(
    poly: ConvexPoly, clipper: ConvexPoly, tol: float = DEFAULT_TOL
) -> ConvexPoly:
    """Clip ``poly`` by every face plane of ``clipper``.

    The analogue of ``Poly::ClipPolyhedron(polyhedron, Polygon3D)``
    (Poly.cpp:548-560) used for per-Voronoi-cell fracture clipping.
    Intersecting with an *empty* clipper yields the empty polytope.
    """
    out = clip_poly_planes(poly, clipper.planes, clipper.face_mask(), tol)
    nv = jnp.where(clipper.is_empty(), 0, out.n_verts)
    return ConvexPoly(out.face_verts, nv, out.planes)


@functools.partial(jax.jit, static_argnames=("tol",))
def clip_batch_by_cells(
    pieces: ConvexPoly, cells: ConvexPoly, tol: float = DEFAULT_TOL
) -> ConvexPoly:
    """(P pieces) × (C cells) grid clip — the fracture fan-out.

    Replaces the 16-thread per-cell task fan-out (m_fractureTask,
    /root/reference/Src/Surtr.cpp:1457-1504, 2129-2146) with a 2-D vmap.
    Returns a ConvexPoly with batch shape (P, C).
    """
    one = lambda piece, cell: clip_poly_poly(piece, cell, tol)
    over_cells = jax.vmap(one, in_axes=(None, 0))
    return jax.vmap(over_cells, in_axes=(0, None))(pieces, cells)


def contains_point(
    poly: ConvexPoly, x: jax.Array, tol: float = DEFAULT_TOL
) -> jax.Array:
    """Point-in-polytope via face planes (reference: VMACH.cpp:480-489)."""
    s = (
        jnp.einsum(
            "...fd,d->...f",
            poly.planes[..., :3],
            x,
            precision=jax.lax.Precision.HIGHEST,
        )
        + poly.planes[..., 3]
    )
    ok = (s <= tol) | ~poly.face_mask()
    return jnp.all(ok, axis=-1) & ~poly.is_empty()
