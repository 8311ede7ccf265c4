"""Exact cut-surface caps for clipped visual meshes.

The reference clips the visual mesh as a CLOSED polyhedron and reconstructs
exact cap cross-sections by chaining cut edges into loops
(Poly::ClipPolyhedron, /root/reference/Src/Poly.cpp:265-554; cap chaining
/root/reference/Src/VMACH.cpp:699-813). Rounds 1-3 approximated the caps with
the refit convex's cut faces — exact on convex models, but on concave models
the convex cut face crosses OUTSIDE the true surface (bunny: convex volume
totalled 1.705x the mesh volume, capped-mesh signed volume 0.70x —
PARITY.md divergence 1).

This module computes the caps EXACTLY, post-hoc, from quantities the pipeline
already has — no change to the hot clip folds:

    cap_t  =  face_t(candidate convex)  ∩  (solid cross-section at plane t)

with the standard boundary decomposition of an intersection of regions,
emitted as a SIGNED fan triangulation (exact for moments/winding/refit even
when fan triangles of opposite orientation overlap):

  * dA — the part of the cap boundary ON the solid surface: exactly the
    edges of the final clipped surface triangles whose endpoints both lie on
    plane t. They are already clipped by every other plane and already
    restricted to the candidate's island, and closed-mesh orientation says
    the cap traverses each such edge OPPOSITE to the surface triangle.
  * dB — the part of the cap boundary on OTHER cut planes (where two cut
    planes meet inside the material): the portions of the convex face t's
    edge loop that lie inside the solid. Each loop edge is split at its 2-D
    crossings with the dA segments and each sub-interval is kept iff its
    midpoint (nudged toward the face interior) is inside the solid.

Every emitted cap vertex except the fan origin lies ON the true piece
boundary, so feeding them (and not the origin) to the refit pool makes the
refit convex tight around the true solid — the other half of the concave
parity fix. The fan origin is the mean of the boundary points, hence inside
their convex hull and inside the refit convex.

Degenerate fan pairs (interior diagonals of the clipped polygons lying on the
plane) cancel in all signed quantities; they only cost triangle slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 3.4e38


def match_cut_faces(poly, cut_planes, cut_mask, scale, tol=1e-4):
    """(..., F) bool — faces of ``poly`` whose plane equals one of the cut
    planes (cap faces carry the cut plane bitwise, so a loose tolerance
    suffices)."""
    from surtr_tpu.ops.linalg import supports

    n = poly.planes[..., :3]
    d = poly.planes[..., 3]
    ndot = supports(
        n, jnp.broadcast_to(cut_planes[..., :3], n.shape[:-2] + cut_planes.shape[-2:-1] + (3,))
    )
    dm = jnp.abs(d[..., None] - cut_planes[..., None, :, 3])
    hit = (jnp.abs(ndot - 1.0) < tol) & (dm < tol * scale) & cut_mask[..., None, :]
    return jnp.any(hit, axis=-1) & poly.face_mask()


def _cap_candidates_one(
    conv, mtris, mmask, cut_planes, cut_mask, mas, cfg, profile_stage=99
):
    """Phase 1 (single candidate): geometry of all potential cap fans.

    Returns a dict of padded per-cut-face tensors:
      a_p/a_q   (CF, NA, 3)      dA fan edge endpoints (cap orientation p->q)
      a_ok      (CF, NA)
      b_pts     (CF, S, X+2, 3)  dB interval endpoints along each loop edge
      b_probe   (CF, S, X+1, 3)  inside-solid probe points (interval mids,
                                 nudged toward the face interior)
      b_elen2   (CF, S, X+1)     squared 3-D interval lengths (degeneracy)
      b_edge_ok (CF, S)
      cf_ok     (CF,)
      n_cf_over ()               cut faces beyond the CF capacity
    """
    from surtr_tpu.ops.clip import plane_basis

    F, S = conv.F, conv.S
    CF = cfg.cap_faces
    NA = cfg.cap_edges
    X = cfg.cap_crossings
    Tp = mtris.shape[0]
    tol_on = 1e-5 * jnp.maximum(mas, 1.0)

    # Front-compact the cut faces and gather their data with ONE one-hot
    # contraction — vmapped top_k lowers to batched variadic sorts and
    # vmapped row gathers are ms-scale on this backend (the round-2/3
    # measured rules the whole pipeline is built around).
    cut_sel = match_cut_faces(conv, cut_planes, cut_mask, mas)   # (F,)
    pos = jnp.cumsum(cut_sel.astype(jnp.int32)) - cut_sel.astype(jnp.int32)
    oh = (
        cut_sel[None, :] & (pos[None, :] == jnp.arange(CF)[:, None])
    ).astype(conv.face_verts.dtype)                              # (CF, F)
    n_cf = jnp.sum(cut_sel)
    cf_ok = jnp.arange(CF) < n_cf
    n_cf_over = jnp.maximum(n_cf - CF, 0)

    # Broadcast-multiply-sum, not einsum: (CF, F) x (F, ...) is the tiny
    # batched-matmul shape the MXU handles poorly (ops/linalg.py).
    loops = jnp.sum(
        oh[:, :, None, None] * conv.face_verts[None], axis=1
    )                                                            # (CF, S, 3)
    nv = jnp.sum(oh * conv.n_verts[None].astype(oh.dtype), axis=1).astype(
        jnp.int32
    )
    pls = jnp.sum(oh[:, :, None] * conv.planes[None], axis=1)    # (CF, 4)

    # --- dA: on-plane edges of the final clipped surface soup -------------
    # Vertex distances to every cut face's plane: (CF, Tp, 3) — broadcast
    # multiply-add on the VPU, NOT einsum (batched tiny matmuls are the
    # known-bad shape on this backend, see ops/linalg.py).
    dv = (
        pls[:, None, None, 0] * mtris[None, :, :, 0]
        + pls[:, None, None, 1] * mtris[None, :, :, 1]
        + pls[:, None, None, 2] * mtris[None, :, :, 2]
        + pls[:, 3, None, None]
    )
    on = jnp.abs(dv) < tol_on                                    # (CF, Tp, 3)
    all_on = jnp.all(on, axis=-1)
    nxt = jnp.array([1, 2, 0])
    e_on = on & on[..., nxt] & mmask[None, :, None] & ~all_on[..., None]
    ea = jnp.broadcast_to(mtris[None], (CF, Tp, 3, 3)).reshape(CF, 3 * Tp, 3)
    eb = jnp.broadcast_to(mtris[:, nxt][None], (CF, Tp, 3, 3)).reshape(
        CF, 3 * Tp, 3
    )
    e_ok = e_on.reshape(CF, 3 * Tp)
    # dA overflow is counted like every other capacity loss — a lost
    # boundary edge silently breaks cap closure, so it must be observable.
    n_a_over = jnp.sum(
        jnp.maximum(jnp.sum(e_ok, axis=1) - NA, 0) * cf_ok
    )
    # Front-compaction by one-hot contraction (see linalg.compact; the
    # top_k form is a batched variadic sort). Cap edge p->q = (b -> a):
    # the cap traverses the shared edge OPPOSITE to the surface triangle
    # (closed-mesh orientation).
    from surtr_tpu.ops.linalg import compact

    if profile_stage <= 1:   # face selection + on-plane edge masks
        return {"_p": jnp.sum(e_ok) + jnp.sum(loops) + jnp.sum(dv)}
    packed, n_a = compact(
        jnp.concatenate([eb, ea], axis=-1), e_ok, NA
    )                                                            # (CF, NA, 6)
    a_p = packed[..., 0:3]
    a_q = packed[..., 3:6]
    a_ok = jnp.arange(NA)[None, :] < n_a[:, None]
    if profile_stage <= 2:   # + dA compaction
        return {"_p": jnp.sum(packed) + jnp.sum(n_a)}

    # --- dB: loop-edge sub-intervals --------------------------------------
    def per_face(loop, nvf, pl, ap, aq, aok, ok_f):
        n = pl[:3]
        u, v = plane_basis(n)
        cen = jnp.sum(
            jnp.where((jnp.arange(S) < nvf)[:, None], loop, 0.0), axis=0
        ) / jnp.maximum(nvf, 1)
        p2 = lambda x: jnp.stack(
            [jnp.sum((x - cen) * u, -1), jnp.sum((x - cen) * v, -1)], axis=-1
        )
        w2 = p2(loop)                                            # (S, 2)
        slot = jnp.arange(S, dtype=jnp.int32)
        is_last = slot == nvf - 1
        w_next = jnp.where(
            is_last[:, None], loop[0:1], jnp.roll(loop, -1, axis=0)
        )
        w2n = jnp.where(is_last[:, None], w2[0:1], jnp.roll(w2, -1, axis=0))
        edge_ok = (slot < nvf) & ok_f

        q0 = p2(ap)                                              # (NA, 2)
        q1 = p2(aq)
        r = w2n - w2                                             # (S, 2)
        s = q1 - q0                                              # (NA, 2)
        cross2 = lambda a, b: a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
        den = cross2(r[:, None, :], s[None, :, :])               # (S, NA)
        dq = q0[None] - w2[:, None]                              # (S, NA, 2)
        tnum = cross2(dq, s[None])
        unum = cross2(dq, r[:, None])
        safe = jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
        tt = tnum / safe
        uu = unum / safe
        # Generous slack on the dA param: a crossing at a dA endpoint is a
        # junction of the cap boundary — extra splits are harmless (both
        # sub-intervals get probed), missed junctions misclassify a whole
        # interval.
        xv = (
            (jnp.abs(den) > 1e-12)
            & aok[None]
            & (tt > 1e-6) & (tt < 1.0 - 1e-6)
            & (uu > -0.05) & (uu < 1.05)
        )
        # X-pass min extraction, ascending (a vmapped jnp.sort over the NA
        # axis is a batched sort launch). Masking ALL ties per pass merges
        # duplicate crossing params — duplicates only produce zero-length
        # intervals anyway.
        tt_m = jnp.where(xv, tt, 1.0)
        ts_cols = []
        for _ in range(X):
            m = jnp.min(tt_m, axis=1, keepdims=True)             # (S, 1)
            ts_cols.append(m)
            tt_m = jnp.where(tt_m <= m, 1.0, tt_m)
        ts = jnp.concatenate(ts_cols, axis=1)                    # (S, X)
        if profile_stage <= 3:  # + crossings + param extraction
            return {"_p": jnp.sum(ts)}
        bounds = jnp.concatenate(
            [jnp.zeros((S, 1)), ts, jnp.ones((S, 1))], axis=1
        )                                                        # (S, X+2)
        e3 = w_next - loop                                       # (S, 3)
        pts = loop[:, None, :] + bounds[..., None] * e3[:, None, :]
        mids = 0.5 * (pts[:, :-1] + pts[:, 1:])                  # (S, X+1, 3)
        # dA-coverage: where the solid's surface meets plane t ON this loop
        # edge, the dA segments already supply that boundary piece (with
        # closed-mesh orientation) — a dB interval whose midpoint lies on a
        # dA segment must yield or the boundary doubles. 2-D point-segment
        # distance of each interval midpoint against every dA segment.
        midb = 0.5 * (bounds[:, :-1] + bounds[:, 1:])            # (S, X+1)
        m2 = w2[:, None, :] + midb[..., None] * r[:, None, :]    # (S,X+1,2)
        dq0 = m2[:, :, None, :] - q0[None, None]                 # (S,X+1,NA,2)
        ss = jnp.sum(s * s, -1)                                  # (NA,)
        tproj = jnp.clip(
            jnp.sum(dq0 * s[None, None], -1)
            / jnp.where(ss > 1e-30, ss, 1.0)[None, None],
            0.0, 1.0,
        )
        d2 = jnp.sum(
            (dq0 - tproj[..., None] * s[None, None]) ** 2, -1
        )                                                        # (S,X+1,NA)
        eps_cov = 3e-4 * mas
        covered = jnp.any(
            (d2 < eps_cov * eps_cov) & aok[None, None], axis=-1
        )                                                        # (S, X+1)
        if profile_stage <= 4:  # + dA coverage
            return {"_p": jnp.sum(covered) + jnp.sum(pts)}
        # Two-sided probe pair: in-plane inward nudge (n x edge for a CCW
        # loop) PLUS an off-plane excursion along ±n. A true cap-boundary
        # edge has material on BOTH sides of the cut plane next to it; a
        # tangent plane (cut plane grazing the solid's surface — e.g. the
        # Voronoi domain walls at the model's bounding box) has material on
        # at most one side, and a single on-surface probe is an inside-test
        # coin flip.
        left = jnp.cross(jnp.broadcast_to(n, e3.shape), e3)
        ln = jnp.linalg.norm(left, axis=-1, keepdims=True)
        left = left / jnp.where(ln > 1e-30, ln, 1.0)
        d_ = cfg.cap_probe_nudge * mas
        base = mids + left[:, None, :] * d_
        # Off-plane excursion δ/4 < the in-plane inward nudge: when the cut
        # plane is PERPENDICULAR to the surface face holding the edge, the
        # left and ±n components cancel along the face normal (|left·n_S| =
        # sinθ vs |n_t·n_S| = cosθ) and an equal-δ probe lands exactly ON
        # the surface — an inside-test coin flip. δ/4 keeps both probes
        # strictly inside for cut angles θ > ~14°, while the tangent case
        # (θ = 0, left inside the surface) still straddles and rejects.
        probe = jnp.stack(
            [base + n * (0.25 * d_), base - n * (0.25 * d_)], axis=2
        )                                                    # (S, X+1, 2, 3)
        seg2 = (bounds[:, 1:] - bounds[:, :-1]) ** 2 * jnp.sum(e3 * e3, -1)[
            :, None
        ]
        return pts, probe, seg2, edge_ok, covered

    if profile_stage <= 4:
        out = jax.vmap(per_face)(loops, nv, pls, a_p, a_q, a_ok, cf_ok)
        return {"_p": out["_p"]}
    b_pts, b_probe, b_elen2, b_edge_ok, b_covered = jax.vmap(per_face)(
        loops, nv, pls, a_p, a_q, a_ok, cf_ok
    )

    # dA validation probes (same two-sided rule): an on-plane soup edge is a
    # TRUE cut edge only if material sits on both sides of the plane next to
    # it — original model edges that merely lie in a tangent plane (and the
    # border ring of a surface face coplanar with a domain wall) must not
    # spawn caps.
    nrm = pls[:, None, :3]                                       # (CF, 1, 3)
    ae = a_q - a_p
    left_a = jnp.cross(jnp.broadcast_to(nrm, ae.shape), ae)
    ln_a = jnp.linalg.norm(left_a, axis=-1, keepdims=True)
    left_a = left_a / jnp.where(ln_a > 1e-30, ln_a, 1.0)
    d_ = cfg.cap_probe_nudge * mas
    a_base = 0.5 * (a_p + a_q) + left_a * d_
    # Same δ/4 off-plane excursion as the dB probes (see per_face).
    a_probe = jnp.stack(
        [a_base + nrm * (0.25 * d_), a_base - nrm * (0.25 * d_)], axis=2
    )                                                            # (CF,NA,2,3)
    return {
        "a_p": a_p, "a_q": a_q, "a_ok": a_ok & cf_ok[:, None],
        "a_probe": a_probe,
        "b_pts": b_pts, "b_probe": b_probe, "b_elen2": b_elen2,
        "b_edge_ok": b_edge_ok, "b_covered": b_covered,
        "cf_ok": cf_ok, "n_cf_over": n_cf_over + n_a_over,
    }


def _assemble_one(cc, a_inside, b_inside, mas, cfg):
    """Phase 3 (single candidate): fan triangles + refit-pool vertices."""
    CF = cfg.cap_faces
    NA = cfg.cap_edges
    X = cfg.cap_crossings
    CT = cfg.cap_tris
    CP = cfg.cap_pool
    S = cc["b_pts"].shape[1]
    eps2 = (1e-6 * jnp.maximum(mas, 1.0)) ** 2

    a_ok = (
        cc["a_ok"]
        & a_inside
        & (jnp.sum((cc["a_p"] - cc["a_q"]) ** 2, -1) > eps2)
    )                                                            # (CF, NA)
    keep_b = (
        b_inside
        & ~cc["b_covered"]
        & cc["b_edge_ok"][..., None]
        & (cc["b_elen2"] > eps2)
    )                                                            # (CF, S, X+1)

    # Fan origin per face: mean of the cap's own boundary points (inside
    # their convex hull, hence inside the refit convex).
    s_a = jnp.sum(
        jnp.where(a_ok[..., None], cc["a_p"] + cc["a_q"], 0.0), axis=1
    )                                                            # (CF, 3)
    e0 = cc["b_pts"][:, :, :-1]                                  # (CF,S,X+1,3)
    e1 = cc["b_pts"][:, :, 1:]
    s_b = jnp.sum(jnp.where(keep_b[..., None], e0 + e1, 0.0), axis=(1, 2))
    cnt = 2 * (jnp.sum(a_ok, axis=1) + jnp.sum(keep_b, axis=(1, 2)))
    origin = (s_a + s_b) / jnp.maximum(cnt, 1)[:, None]          # (CF, 3)

    def tri(o, p, q):
        return jnp.stack([jnp.broadcast_to(o, p.shape), p, q], axis=-2)

    a_tris = tri(origin[:, None], cc["a_p"], cc["a_q"])          # (CF,NA,3,3)
    b_tris = tri(origin[:, None, None], e0, e1)                  # (CF,S,X+1,3,3)
    # Front-compactions by one-hot contraction (vmapped top_k = batched
    # variadic sort; see linalg.compact).
    from surtr_tpu.ops.linalg import compact

    rows = jnp.concatenate(
        [a_tris.reshape(-1, 9), b_tris.reshape(-1, 9)]
    )
    oks = jnp.concatenate([a_ok.reshape(-1), keep_b.reshape(-1)])
    cap_rows, n_cap = compact(rows, oks, CT)
    cap_rows = cap_rows.reshape(CT, 3, 3)
    cap_ok = jnp.arange(CT) < n_cap
    over = jnp.maximum(jnp.sum(oks) - CT, 0)

    # Refit-pool vertices: dB interval endpoints (dA endpoints are surface
    # vertices already in the pool; fan origins are NOT boundary points).
    pv = jnp.concatenate(
        [e0.reshape(-1, 3), e1.reshape(-1, 3)]
    )
    pm = jnp.concatenate([keep_b.reshape(-1), keep_b.reshape(-1)])
    pool_v, n_pool = compact(pv, pm, CP)
    pool_m = jnp.arange(CP) < n_pool
    # Pool overflow means some cap vertices are NOT fed to the refit — the
    # refit slabs may then cut the cap (mesh poking out of its convex).
    pool_over = jnp.maximum(jnp.sum(pm) - CP, 0)
    return cap_rows, cap_ok, pool_v, pool_m, over + pool_over + cc["n_cf_over"]


def cap_fans_batch(
    conv, mtris, mmask, cut_planes, cut_mask, solid_t, solid_m, mas, cfg,
    solid_grid=None,
):
    """Exact caps for a candidate batch (leading axis N).

    Args mirror ``_finish_pieces``: conv is the PRE-refit candidate convex
    (its faces on the cut planes bound the true cap exactly — the convex is
    a superset of the piece), mtris/mmask the final clipped (island-masked)
    surface soup, cut_planes/cut_mask the half-spaces applied THIS round
    (pre-existing faces keep their old caps in the soup; the in-plane-polygon
    drop rule in the mesh clip removes old caps on re-cut planes),
    solid_t/solid_m the per-candidate source solids. ``solid_grid`` (from
    ``build_parity_grid`` over ONE shared source solid) replaces per-probe
    winding when available (prepare); do_fracture probes per-candidate
    winding numbers against the parent's capped mesh.

    Returns (cap_rows (N, CT, 3, 3), cap_ok (N, CT), pool_v (N, CP, 3),
    pool_m (N, CP), dropped ()).
    """
    from surtr_tpu.ops.mesh_clip import parity_grid_inside, point_in_mesh

    cc = jax.vmap(
        lambda cv, mt, mm, cp, cm: _cap_candidates_one(
            cv, mt, mm, cp, cm, mas, cfg
        )
    )(conv, mtris, mmask, cut_planes, cut_mask)

    N = cc["b_probe"].shape[0]
    na = cc["a_probe"].reshape(N, -1, 3).shape[1]
    probes = jnp.concatenate(
        [cc["a_probe"].reshape(N, -1, 3), cc["b_probe"].reshape(N, -1, 3)],
        axis=1,
    )
    if solid_grid is not None:
        flat = probes.reshape(-1, 3)
        inside = parity_grid_inside(solid_grid, flat).reshape(probes.shape[:2])
    else:
        # Ray parity, not winding numbers: exact-caps solids are exactly
        # closed (that is the point of this module), parity is robust to
        # the signed canceling fan pairs (two crossings), and the winding
        # form's per-(probe, tri) atan2 was the caps path's largest real
        # cost (~13 ms of ~20 at 1k cube candidates).
        inside = jax.vmap(point_in_mesh)(probes, solid_t, solid_m)
    # A boundary edge is real only if BOTH off-plane probes are in material.
    a_inside = jnp.all(
        inside[:, :na].reshape(cc["a_probe"].shape[:4]), axis=-1
    )
    b_inside = jnp.all(
        inside[:, na:].reshape(cc["b_probe"].shape[:5]), axis=-1
    )

    cap_rows, cap_ok, pool_v, pool_m, over = jax.vmap(
        lambda c, ai, bi: _assemble_one(c, ai, bi, mas, cfg)
    )(cc, a_inside, b_inside)
    return cap_rows, cap_ok, pool_v, pool_m, jnp.sum(over)
