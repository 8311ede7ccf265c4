"""Pallas TPU pooled triangle-soup clip kernel.

Folds EVERY plane of each pooled (cell, triangle) pair's cell in ONE kernel
launch. The XLA ``clip_polys_by_rows`` scan costs ~30 ops × K plane steps of
per-op dispatch overhead (measured 51 ms of the pumpkin 1k decomposition at
a 160k-pair pool × 32 planes), plus an 80 MB per-pair plane gather feeding
it. Here:

  * lanes are POOLED PAIRS (batch-minor, the package's standard layout);
    polygon slots live on sublanes ((S, BN) rows per coordinate);
  * each lane's cell-plane table is reconstructed IN KERNEL from the
    (K·5, C) per-cell table with one one-hot MXU matmul per block — no
    HBM gather;
  * the in-plane-polygon drop rule's "this plane removes material from the
    cell" context is evaluated from the ORIGINAL triangle vertices with a
    block-local per-cell reduction (two small MXU passes). Divergence from
    the XLA path: the context is per lane-block, so a cell whose pairs
    straddle a block boundary evaluates the rule on each half separately —
    the rule only fires for polygons lying WITHIN tol of a bisector
    (measure-zero for real models), and the pool keeps cells contiguous so
    at most one cell per block boundary is affected.

Semantics otherwise match ``ops.mesh_clip._clip_polys_plane`` (cyclic-run
emission, first-run start, exit/enter crossings, convexity multirun guard).

Reference: Poly::ClipPolyhedron on Piece::Mesh
(/root/reference/Src/Surtr.cpp:1470-1472, Poly.cpp:265-554) — here as the
soup clip of the TPU redesign (DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38


def _soup_kernel(
    tri_ref,      # (9, BN) original triangle corners [x0 x1 x2 y0.. z0..]
    cell_ref,     # (1, BN) i32 cell id per lane
    valid_ref,    # (1, BN) f32 lane validity
    ptab_ref,     # (K8, C) f32 per-cell plane rows, 8 rows per plane
                  # (nx ny nz d ok 0 0 0 — 8-row stride so the fold's
                  # dynamic sublane slices are provably 8-aligned)
    poly_ref,     # (3S, BN) out clipped polygons [x rows | y rows | z rows]
    nv_ref,       # (1, BN) i32 out vertex counts
    mrun_ref,     # (1, BN) i32 out multirun-drop counts
    planes_scr,   # (K·8, BN) VMEM scratch: per-lane plane table + rm row
    *, K: int, S: int, C: int, tol: float,
):
    f32 = jnp.float32
    BN = cell_ref.shape[1]
    big = jnp.asarray(BIG, f32)

    cell = cell_ref[:]                                   # (1, BN) i32
    valid = valid_ref[:] > 0.5                           # (1, BN)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (C, BN), 0) == cell
    ).astype(f32)                                        # (C, BN)

    # Per-lane plane table: (K·8, C) @ (C, BN) on the MXU.
    L = jax.lax.dot_general(
        ptab_ref[:], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                    # (K·8, BN)

    tri = tri_ref[:]                                     # (9, BN)
    tx, ty, tz = tri[0:3], tri[3:6], tri[6:9]            # (3, BN) each

    # In-plane context: rm[k] = any ORIGINAL vertex of any of the cell's
    # (block-local) triangles strictly beyond plane k.
    rm_rows = []
    for k in range(K):
        p = L[8 * k : 8 * k + 5, :]
        d3 = tx * p[0:1] + ty * p[1:2] + tz * p[2:3] + p[3:4]   # (3, BN)
        beyond = jnp.max(d3, axis=0, keepdims=True) > tol
        rm_rows.append(
            (beyond & valid & (p[4:5] > 0.5)).astype(f32)
        )
    rm_lane = jnp.concatenate(rm_rows, axis=0)           # (K, BN)
    percell = jax.lax.dot_general(                       # (K, C)
        rm_lane, onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    rm_ctx = jax.lax.dot_general(                        # (K, BN)
        (percell > 0.5).astype(f32), onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    # Fold the rm row into each plane's 8-row group (row 8k+5) so the
    # fold body reads ONE 8-aligned dynamic slice per step.
    z1 = jnp.zeros((2, BN), f32)
    planes_scr[:] = jnp.concatenate(
        [
            jnp.concatenate(
                [L[8 * k : 8 * k + 5, :], rm_ctx[k : k + 1, :], z1], axis=0
            )
            for k in range(K)
        ],
        axis=0,
    )

    slot = jax.lax.broadcasted_iota(jnp.int32, (S, BN), 0)
    zS = jnp.zeros((S, BN), f32)
    px = jnp.where(slot == 0, tx[0:1], jnp.where(slot == 1, tx[1:2],
                   jnp.where(slot == 2, tx[2:3], zS)))
    py = jnp.where(slot == 0, ty[0:1], jnp.where(slot == 1, ty[1:2],
                   jnp.where(slot == 2, ty[2:3], zS)))
    pz = jnp.where(slot == 0, tz[0:1], jnp.where(slot == 1, tz[1:2],
                   jnp.where(slot == 2, tz[2:3], zS)))
    nv = jnp.where(valid, 3, 0).astype(jnp.int32)        # (1, BN)
    mrun = jnp.zeros((1, BN), jnp.int32)

    def body(k, carry):
        px, py, pz, nv, mrun = carry
        p = planes_scr[pl.ds(pl.multiple_of(8 * k, 8), 8), :]   # (8, BN)
        nx, ny, nz, d, ok_f = p[0:1], p[1:2], p[2:3], p[3:4], p[4:5]
        ok = ok_f > 0.5
        rm_any = p[5:6] > 0.5                            # (1, BN)

        m = slot < nv
        dist = px * nx + py * ny + pz * nz + d           # (S, BN)
        is_last = slot == nv - 1

        def nxt(a):
            r = pltpu.roll(a, S - 1, axis=0)             # a[(s+1) mod S]
            return jnp.where(is_last, a[0:1], r)

        vnx, vny, vnz = nxt(px), nxt(py), nxt(pz)
        dn = nxt(dist)
        kept = m & (dist <= tol)
        denom = dn - dist
        safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
        pcx = (px * dn - vnx * dist) / safe
        pcy = (py * dn - vny * dist) / safe
        pcz = (pz * dn - vnz * dist) / safe

        cross_exit = m & (dist < -tol) & (dn > tol)
        cross_enter = m & (dist > tol) & (dn < -tol)
        f_ex = cross_exit.astype(f32)
        f_en = cross_enter.astype(f32)
        exit_x = jnp.sum(f_ex * pcx, axis=0, keepdims=True)
        exit_y = jnp.sum(f_ex * pcy, axis=0, keepdims=True)
        exit_z = jnp.sum(f_ex * pcz, axis=0, keepdims=True)
        enter_x = jnp.sum(f_en * pcx, axis=0, keepdims=True)
        enter_y = jnp.sum(f_en * pcy, axis=0, keepdims=True)
        enter_z = jnp.sum(f_en * pcz, axis=0, keepdims=True)
        ex_i = jnp.any(cross_exit, axis=0, keepdims=True).astype(jnp.int32)
        en_i = jnp.any(cross_enter, axis=0, keepdims=True).astype(jnp.int32)

        kept_i = kept.astype(jnp.int32)
        klast = jnp.sum(jnp.where(is_last, kept_i, 0), axis=0, keepdims=True)
        kprev = jnp.where(
            slot == 0, klast, pltpu.roll(kept_i, 1, axis=0)
        )
        startm = kept & (kprev == 0)
        nstarts = jnp.sum(startm.astype(jnp.int32), axis=0, keepdims=True)
        a = jnp.sum(jnp.where(startm, slot, 0), axis=0, keepdims=True)
        mcnt = jnp.sum(kept_i, axis=0, keepdims=True)

        # rot[j] = poly[(a+j) mod nv] via two log-step barrel shifts.
        b_amt = jnp.where(a > 0, nv - a, 0)

        def rotate(x):
            xl = x
            xr = x
            t = 1
            while t < S:
                bit_l = ((a // t) % 2) > 0
                moved_l = jnp.concatenate(
                    [xl[t:], jnp.zeros((t, BN), x.dtype)], axis=0
                )
                xl = jnp.where(bit_l, moved_l, xl)
                bit_r = ((b_amt // t) % 2) > 0
                moved_r = jnp.concatenate(
                    [jnp.zeros((t, BN), x.dtype), xr[: S - t]], axis=0
                )
                xr = jnp.where(bit_r, moved_r, xr)
                t *= 2
            return jnp.where(slot < b_amt, xl, xr)

        rotx, roty, rotz = rotate(px), rotate(py), rotate(pz)
        in_run = slot < mcnt
        at_exit = (slot == mcnt) & (ex_i > 0)
        at_enter = (slot == mcnt + ex_i) & (en_i > 0)

        def emit(rot, epx, enx):
            return jnp.where(
                in_run, rot,
                jnp.where(at_exit, epx, jnp.where(at_enter, enx, 0.0)),
            )

        ox = emit(rotx, exit_x, enter_x)
        oy = emit(roty, exit_y, enter_y)
        oz = emit(rotz, exit_z, enter_z)
        n_out = jnp.minimum(mcnt + ex_i + en_i, S)

        inplane = (
            jnp.min(
                jnp.where(m, (jnp.abs(dist) <= tol).astype(f32), 1.0),
                axis=0, keepdims=True,
            ) > 0.5
        ) & (nv > 0)
        n_out = jnp.where(inplane & rm_any, 0, n_out)
        multirun = nstarts > 1
        n_out = jnp.where(multirun, 0, n_out)
        n_out = jnp.where(n_out >= 3, n_out, 0)

        px = jnp.where(ok, ox, px)
        py = jnp.where(ok, oy, py)
        pz = jnp.where(ok, oz, pz)
        nv = jnp.where(ok, n_out, nv)
        mrun = mrun + jnp.where(ok & multirun, 1, 0)
        return px, py, pz, nv, mrun

    px, py, pz, nv, mrun = jax.lax.fori_loop(
        0, K, body, (px, py, pz, nv, mrun)
    )
    poly_ref[:] = jnp.concatenate([px, py, pz], axis=0)
    nv_ref[:] = nv
    mrun_ref[:] = mrun


def soup_clip_pooled_pallas(
    tri_corners: jax.Array,     # (P, 3, 3) pooled triangles
    valid: jax.Array,           # (P,)
    cell_id: jax.Array,         # (P,) i32 in [0, C)
    cell_planes: jax.Array,     # (C, K, 4)
    cell_pmask: jax.Array,      # (C, K)
    poly_slots: int = 8,
    tol: float = 1e-6,
    interpret: bool = False,
):
    """Returns (poly (P, S, 3), n_vert (P,), multirun_drops) — the pooled
    equivalent of ``clip_polys_by_rows`` with the plane gather and the
    K-step XLA scan folded into one kernel."""
    P = tri_corners.shape[0]
    C, K, _ = cell_planes.shape
    S = poly_slots
    f32 = tri_corners.dtype

    BN = 2048 if P >= 2048 else max(128, ((P + 127) // 128) * 128)
    Pp = ((P + BN - 1) // BN) * BN
    padl = lambda a: jnp.pad(a, ((0, 0), (0, Pp - P)))

    triT = padl(tri_corners.transpose(2, 1, 0).reshape(9, P))
    cellT = padl(cell_id.astype(jnp.int32)[None])
    validT = padl(valid.astype(f32)[None])
    # (K·8, C): rows 8k..8k+4 = nx ny nz d ok of plane k, rest zero
    # (8-row stride keeps the kernel's dynamic sublane slices aligned).
    zc = jnp.zeros((3, C), f32)
    ptab = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    cell_planes[:, k, :].T,
                    cell_pmask[:, k].astype(f32)[None],
                    zc,
                ],
                axis=0,
            )
            for k in range(K)
        ],
        axis=0,
    )
    grid = (Pp // BN,)
    kernel = functools.partial(_soup_kernel, K=K, S=S, C=C, tol=tol)
    polyT, nvT, mrunT = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((9, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * K, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3 * S, BN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3 * S, Pp), f32),
            jax.ShapeDtypeStruct((1, Pp), jnp.int32),
            jax.ShapeDtypeStruct((1, Pp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * K, BN), f32),
        ],
        interpret=interpret,
    )(triT, cellT, validT, ptab)

    poly = polyT.reshape(3, S, Pp).transpose(2, 1, 0)[:P]
    return poly, nvT[0, :P], jnp.sum(mrunT[0, :P])
