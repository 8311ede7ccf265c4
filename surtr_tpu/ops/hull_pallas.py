"""Pallas TPU limited incremental convex hull (single polytope).

The XLA ``ops.hull.ich`` is a ``fori_loop`` whose body is ~50 small ops
(argmax chains, index gathers, an argsort, scatters); on this backend the
sequential per-op overhead dominates — measured ~0.7 ms for the 8-vertex
cube and ~4.9 ms for the 5002-vertex pumpkin, all of it dispatch. This
kernel runs the whole greedy insertion loop in VMEM: points live on lanes
((1, N) rows per coordinate), faces as (F, 1) index columns, and every
gather / argsort / scatter becomes a one-hot contraction over the tiny
(3F, 3F) / (F, N) domains.

Semantics mirror ops.hull.ich (greedy volume-max insertion, first-of-ties
argmax, horizon via twin-edge matching, stable free-slot assignment,
outward orientation against the seed-tetra centroid). Face SLOT ordering
matches the XLA version's argsort-based assignment, so outputs agree
bitwise on non-degenerate inputs (interpret-mode parity test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38


def _cumsum_lanes(x):
    n = x.shape[-1]
    k = 1
    while k < n:
        pad = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
        x = x + jnp.concatenate([pad, x[..., : n - k]], axis=-1)
        k *= 2
    return x


def _cumsum_rows(x):
    n = x.shape[0]
    k = 1
    while k < n:
        pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[: n - k]], axis=0)
        k *= 2
    return x


def _ich_kernel(
    px_ref, py_ref, pz_ref, pm_ref,   # (1, N) f32 / i32
    nrm_ref,                          # (F, 8) out [nx ny nz valid]
    inner_ref,                        # (1, 8) out [ix iy iz]
    *, N: int, F: int, n_insert: int,
):
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]            # (1, N)
    pm = pm_ref[:] > 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    def at_max(score):
        """First-of-ties masked argmax → (index (1,1) i32, onehot (1,N))."""
        sc = jnp.where(pm, score, neg)
        m = sc >= jnp.max(sc, axis=1, keepdims=True)
        first = m & (_cumsum_lanes(m.astype(jnp.int32)) == 1)
        idx = jnp.sum(jnp.where(first, lane, 0), axis=1, keepdims=True)
        return idx, first.astype(f32)

    def coords(onehot):
        return (
            jnp.sum(onehot * px, 1, keepdims=True),
            jnp.sum(onehot * py, 1, keepdims=True),
            jnp.sum(onehot * pz, 1, keepdims=True),
        )

    # --- seed tetrahedron (BuildFirstHull semantics) ---
    i1, w1 = at_max(px)
    x1, y1, z1 = coords(w1)
    d1 = (px - x1) ** 2 + (py - y1) ** 2 + (pz - z1) ** 2
    i2, w2 = at_max(d1)
    x2, y2, z2 = coords(w2)
    ex, ey, ez = x2 - x1, y2 - y1, z2 - z1
    rx, ry, rz = px - x1, py - y1, pz - z1
    cx = ey * rz - ez * ry
    cy = ez * rx - ex * rz
    cz = ex * ry - ey * rx
    i3, w3 = at_max(cx * cx + cy * cy + cz * cz)
    x3, y3, z3 = coords(w3)
    ax, ay, az = x1 - px, y1 - py, z1 - pz
    bx, by, bz = x2 - px, y2 - py, z2 - pz
    gx, gy, gz = x3 - px, y3 - py, z3 - pz
    v4 = (
        ax * (by * gz - bz * gy)
        + ay * (bz * gx - bx * gz)
        + az * (bx * gy - by * gx)
    )
    i4, w4 = at_max(v4)
    x4, y4, z4 = coords(w4)
    ix = (x1 + x2 + x3 + x4) * 0.25
    iy = (y1 + y2 + y3 + y4) * 0.25
    iz = (z1 + z2 + z3 + z4) * 0.25

    frow = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    erow = jax.lax.broadcasted_iota(jnp.int32, (3 * F, 1), 0)
    elane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * F), 1)
    flane = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)

    def bsel(cond, a, b):
        return jnp.where(cond, a, b)

    # Initial faces (i1 i2 i3), (i1 i2 i4), (i1 i3 i4), (i2 i3 i4) at
    # slots 0..3, oriented below with everything else in the loop body;
    # to share the code path, orient them here directly.
    def orient(f0, f1, f2):
        """Return (f0, f1', f2') with outward orientation vs inner."""
        c0 = pt_coords3(f0)
        c1 = pt_coords3(f1)
        c2 = pt_coords3(f2)
        v = _tet_vol(c0, c1, c2, (ix, iy, iz))
        swap = v < 0
        return (
            f0,
            bsel(swap, f2, f1),
            bsel(swap, f1, f2),
        )

    def pt_coords3(idx_col):
        """(R, 1) i32 indices → three (R, 1) coordinate columns."""
        oh = (idx_col == lane).astype(f32)                  # (R, N)
        return (
            jnp.sum(oh * px, 1, keepdims=True),
            jnp.sum(oh * py, 1, keepdims=True),
            jnp.sum(oh * pz, 1, keepdims=True),
        )

    def _tet_vol(a, b, c, p):
        axx, ayy, azz = a[0] - p[0], a[1] - p[1], a[2] - p[2]
        bxx, byy, bzz = b[0] - p[0], b[1] - p[1], b[2] - p[2]
        cxx, cyy, czz = c[0] - p[0], c[1] - p[1], c[2] - p[2]
        return (
            axx * (byy * czz - bzz * cyy)
            + ayy * (bzz * cxx - bxx * czz)
            + azz * (bxx * cyy - byy * cxx)
        )

    z1i = jnp.zeros((F, 1), jnp.int32)
    sel0 = (frow == 0).astype(jnp.int32)
    sel1 = (frow == 1).astype(jnp.int32)
    sel2 = (frow == 2).astype(jnp.int32)
    sel3 = (frow == 3).astype(jnp.int32)
    fi0 = sel0 * i1 + sel1 * i1 + sel2 * i1 + sel3 * i2
    fi1 = sel0 * i2 + sel1 * i2 + sel2 * i3 + sel3 * i3
    fi2 = sel0 * i3 + sel1 * i4 + sel2 * i4 + sel3 * i4
    fi0, fi1, fi2 = orient(fi0, fi1, fi2)
    fvalid_i = (frow < 4).astype(jnp.int32)

    def vols_all(f0, f1, f2, fval):
        """(F, N) signed tet volumes of every (face, point) pair."""
        a = pt_coords3(f0)
        b = pt_coords3(f1)
        c = pt_coords3(f2)
        v = _tet_vol(a, b, c, (px, py, pz))
        return jnp.where(fval, v, 0.0)

    v0 = vols_all(fi0, fi1, fi2, fvalid_i > 0)
    priority = jnp.sum(jnp.maximum(v0, 0.0), axis=0, keepdims=True)
    seeded = (w1 + w2 + w3 + w4) > 0.5
    priority = jnp.where(pm & ~seeded, priority, neg)

    def body(_, carry):
        fi0, fi1, fi2, fvalid_i, priority = carry
        kidx, kone = at_max(priority)
        kx, ky, kz = coords(kone)
        can_i = (jnp.max(priority) > neg / 2).astype(jnp.int32)

        a = pt_coords3(fi0)
        b = pt_coords3(fi1)
        c = pt_coords3(fi2)
        fvf = fvalid_i.astype(f32)
        volf = fvf * _tet_vol(a, b, c, (kx, ky, kz))
        visible_i = fvalid_i * (volf < 0).astype(jnp.int32)
        any_vis_i = jnp.max(visible_i) * can_i              # scalar i32

        # Directed edges in FACE-MAJOR order (edge row e = f*3 + c), the
        # XLA version's reshape order: e0 = faces, e1 = roll(faces, -1).
        fsel = (erow // 3 == flane).astype(jnp.int32)       # (3F, F)
        c_of = erow % 3

        def face_col_to_edges(col_lane):                    # (1, F) → (3F, 1)
            return jnp.sum(fsel * col_lane, axis=1, keepdims=True)

        def to_lane_f(col):                                 # (F, 1) → (1, F)
            oh = (frow == flane).astype(col.dtype)
            return jnp.sum(oh * col, axis=0, keepdims=True)

        fi0_l = to_lane_f(fi0)
        fi1_l = to_lane_f(fi1)
        fi2_l = to_lane_f(fi2)
        g0 = face_col_to_edges(fi0_l)
        g1 = face_col_to_edges(fi1_l)
        g2 = face_col_to_edges(fi2_l)
        e0 = bsel(c_of == 0, g0, bsel(c_of == 1, g1, g2))
        e1 = bsel(c_of == 0, g1, bsel(c_of == 1, g2, g0))

        vis_l = to_lane_f(visible_i)                        # (1, F) i32
        val_l = to_lane_f(fvalid_i)
        owner_vis = jnp.sum(fsel * vis_l, 1, keepdims=True)  # (3F, 1) i32
        owner_val = jnp.sum(fsel * val_l, 1, keepdims=True)

        def to_lane_e(col):                                 # (3F, 1) → (1, 3F)
            oh = (erow == elane).astype(col.dtype)
            return jnp.sum(oh * col, axis=0, keepdims=True)

        e0_l = to_lane_e(e0)
        e1_l = to_lane_e(e1)
        ovis_l = to_lane_e(owner_vis)                       # (1, 3F) i32
        oval_l = to_lane_e(owner_val)
        twin_i = (
            (e0 == e1_l).astype(jnp.int32)
            * (e1 == e0_l).astype(jnp.int32)
            * oval_l
        )                                                   # (3F, 3F) i32
        twin_hidden = jnp.max(
            twin_i * (1 - ovis_l), axis=1, keepdims=True
        )                                                   # (3F, 1) i32
        hz_i = owner_vis * owner_val * twin_hidden          # 0/1

        # Stable free-slot assignment (matches argsort(fvalid_mid)[rank]).
        fvalid_mid_i = fvalid_i * (1 - visible_i * any_vis_i)
        rank = _cumsum_rows(hz_i) - hz_i                    # (3F, 1)
        fr_i = 1 - fvalid_mid_i
        rank_free = _cumsum_rows(fr_i) - fr_i               # (F, 1)
        rank_l = to_lane_e(rank)                            # (1, 3F)
        hz_l = to_lane_e(hz_i)
        # M[f, e] = edge e's new face lands on slot f.
        M = (
            fr_i * (rank_free == rank_l).astype(jnp.int32) * hz_l
        ).astype(f32)                                       # (F, 3F)
        placed_i = (
            jnp.sum(M, axis=1, keepdims=True) > 0.5
        ).astype(jnp.int32)

        e0f = jnp.sum(M * e0_l.astype(f32), 1, keepdims=True).astype(jnp.int32)
        e1f_ = to_lane_e(e1)
        e1f = jnp.sum(M * e1f_.astype(f32), 1, keepdims=True).astype(jnp.int32)
        n0, n1, n2 = e0f, e1f, jnp.broadcast_to(kidx, (F, 1)).astype(jnp.int32)
        # Orient the new faces against the fixed interior point.
        na = pt_coords3(n0)
        nb = pt_coords3(n1)
        nc = pt_coords3(n2)
        nv = _tet_vol(na, nb, nc, (ix, iy, iz))
        sw_i = (nv < 0).astype(jnp.int32)
        n1o = sw_i * n2 + (1 - sw_i) * n1
        n2o = sw_i * n1 + (1 - sw_i) * n2

        # Gate everything on any_vis·placed with i32 arithmetic (narrow
        # i1 vectors trip Mosaic's relayout/truncation paths).
        dpm = placed_i * any_vis_i                          # (F, 1) 0/1
        fi0_n = dpm * n0 + (1 - dpm) * fi0
        fi1_n = dpm * n1o + (1 - dpm) * fi1
        fi2_n = dpm * n2o + (1 - dpm) * fi2
        fvalid_n = jnp.minimum(fvalid_mid_i + dpm, 1)
        fvalid_o = (
            any_vis_i * fvalid_n + (1 - any_vis_i) * fvalid_i
        )

        # Priority update: subtract removed visible faces, add new faces.
        v_old = vols_all(fi0, fi1, fi2, visible_i > 0)
        v_new = vols_all(fi0_n, fi1_n, fi2_n, dpm > 0)
        dp = jnp.sum(jnp.maximum(v_new, 0.0), 0, keepdims=True) - jnp.sum(
            jnp.maximum(v_old, 0.0), 0, keepdims=True
        )
        av_f = any_vis_i.astype(f32)
        pr_n = jnp.where(
            priority > neg / 2, priority + dp * av_f, neg
        )
        priority = jnp.where(kone > 0.5, neg, pr_n)

        avm = jnp.broadcast_to(any_vis_i, (F, 1))
        fi0 = avm * fi0_n + (1 - avm) * fi0
        fi1 = avm * fi1_n + (1 - avm) * fi1
        fi2 = avm * fi2_n + (1 - avm) * fi2
        return fi0, fi1, fi2, fvalid_o, priority

    fi0, fi1, fi2, fvalid_i, priority = jax.lax.fori_loop(
        0, n_insert, body, (fi0, fi1, fi2, fvalid_i, priority)
    )
    fvalid = fvalid_i > 0

    # Final normals (hull.py tail): n = cross(b - a, c - a), unit, valid
    # gated on |n| (degenerate faces dropped).
    a = pt_coords3(fi0)
    b = pt_coords3(fi1)
    c = pt_coords3(fi2)
    ux, uy, uz = b[0] - a[0], b[1] - a[1], b[2] - a[2]
    wx, wy, wz = c[0] - a[0], c[1] - a[1], c[2] - a[2]
    nx = uy * wz - uz * wy
    ny = uz * wx - ux * wz
    nz = ux * wy - uy * wx
    ln = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv = 1.0 / jnp.maximum(ln, 1e-30)
    ok = fvalid & (ln > 1e-20)
    okf = ok.astype(f32)
    z = jnp.zeros((F, 1), f32)
    nrm_ref[:] = jnp.concatenate(
        [nx * inv * okf, ny * inv * okf, nz * inv * okf, okf, z, z, z, z],
        axis=1,
    )
    z1 = jnp.zeros((1, 1), f32)
    inner_ref[:] = jnp.concatenate(
        [ix, iy, iz, z1, z1, z1, z1, z1], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("limit", "max_faces", "interpret")
)
def ich_pallas(
    points: jax.Array,
    mask: jax.Array,
    limit: int,
    max_faces: int | None = None,
    interpret: bool = False,
):
    """Single-polytope greedy limited hull — same contract as
    ``ops.hull.ich`` minus the raw ``faces`` index table (callers use
    normals/face_valid/inner only)."""
    N = points.shape[0]
    F = max_faces if max_faces is not None else 2 * max(limit, 4) + 4
    Npad = ((N + 127) // 128) * 128
    n_insert = max(min(limit, N) - 4, 0)

    def pad1(a, fill):
        return jnp.pad(
            a[None], ((0, 0), (0, Npad - N)), constant_values=fill
        )

    px = pad1(points[:, 0].astype(jnp.float32), 0.0)
    py = pad1(points[:, 1].astype(jnp.float32), 0.0)
    pz = pad1(points[:, 2].astype(jnp.float32), 0.0)
    pmm = pad1(mask.astype(jnp.int32), 0)

    kernel = functools.partial(
        _ich_kernel, N=Npad, F=F, n_insert=n_insert
    )
    full = lambda r, c: pl.BlockSpec(
        (r, c), lambda: (0, 0), memory_space=pltpu.VMEM
    )
    nrm, inner = pl.pallas_call(
        kernel,
        grid=(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[full(1, Npad)] * 4,
        out_specs=(full(F, 8), full(1, 8)),
        out_shape=(
            jax.ShapeDtypeStruct((F, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ),
        interpret=interpret,
    )(px, py, pz, pmm)
    return {
        "normals": nrm[:, 0:3],
        "face_valid": nrm[:, 3] > 0.5,
        "inner": inner[0, 0:3],
    }
