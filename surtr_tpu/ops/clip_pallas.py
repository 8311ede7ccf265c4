"""Pallas TPU plane-fold clip kernel.

Semantics: identical to folding ``ops.clip.clip_poly_plane`` over a (K, 4)
plane list (the reference's plane loop in Poly::ClipPolyhedron,
/root/reference/Src/Poly.cpp:291-300) — but the entire polytope state lives in
VMEM across all K plane steps. The XLA ``lax.scan`` version round-trips the
(F, S) polytope plus the one-hot compaction intermediates through HBM on every
step (~0.3 ms/step measured on v5e — the decomposition's dominant cost);
this kernel does the fold at VPU speed.

Layout: batch-minor ("structure of arrays"): every per-polytope scalar is a
lane vector, so a block of BN polytopes fills the 128-wide VPU lanes exactly.
Coordinates are planar (x/y/z arrays of (F, S, BN)) because a trailing dim of
3 would waste 125 of 128 lanes.

Kernel-internal differences from ops.clip (same cyclic order, same results):
  * cap-point ordering uses the diamond pseudo-angle instead of atan2
    (identical cyclic order, no transcendentals);
  * the cap candidate pool is compacted across faces to 2·S slots before
    ranking (the XLA path ranks all F·CAPS slots); both paths then truncate
    the deduped cap loop to S vertices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surtr_tpu.types import ConvexPoly

DEFAULT_TOL = 1e-6
CAPS = 3  # per-face cap-point slots (matches ops.clip.CAPS)


def _cumsum1(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis 1 via log-step shifted adds (3-D safe)."""
    n = x.shape[1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:, :k, :]), x[:, : n - k, :]], axis=1
        )
        x = x + shifted
        k *= 2
    return x


def _clip_kernel(
    # inputs (VMEM refs)
    fvx_ref, fvy_ref, fvz_ref,          # (F*S, BN)
    nv_ref,                              # (F, BN) i32
    pnx_ref, pny_ref, pnz_ref, pd_ref,   # (F, BN)
    cnx_ref, cny_ref, cnz_ref, cd_ref,   # (K, BN)
    cm_ref,                              # (K, BN) i32 (bool as i32)
    # outputs
    ofvx_ref, ofvy_ref, ofvz_ref, onv_ref,
    opnx_ref, opny_ref, opnz_ref, opd_ref,
    *, F: int, S: int, K: int, tol: float,
):
    BN = nv_ref.shape[-1]
    f32 = fvx_ref.dtype

    # State lives in the OUTPUT refs (VMEM) and is mutated across the plane
    # fold; the expensive compaction/cap update is predicated on "this plane
    # removed a vertex of ANY polytope in the block". With plane lists
    # sorted nearest-bisector-first (ops/voronoi, _cell_plane_sets), later
    # planes almost never cut, so most steps cost only the distance test.
    ofvx_ref[:] = fvx_ref[:]
    ofvy_ref[:] = fvy_ref[:]
    ofvz_ref[:] = fvz_ref[:]
    onv_ref[:] = nv_ref[:]
    opnx_ref[:] = pnx_ref[:]
    opny_ref[:] = pny_ref[:]
    opnz_ref[:] = pnz_ref[:]
    opd_ref[:] = pd_ref[:]

    slot = jax.lax.broadcasted_iota(jnp.int32, (F, S, BN), 1)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (F, BN), 0)
    pool_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * S, BN), 0)
    cap_iota = jax.lax.broadcasted_iota(jnp.int32, (S, BN), 0)

    def body(k, _):
        ok = cm_ref[pl.ds(k, 1), :][0] > 0                       # (BN,)
        # Masked-out plane → the all-kept no-op plane (0,0,0,-1).
        nx = jnp.where(ok, cnx_ref[pl.ds(k, 1), :][0], 0.0)      # (BN,)
        ny = jnp.where(ok, cny_ref[pl.ds(k, 1), :][0], 0.0)
        nz = jnp.where(ok, cnz_ref[pl.ds(k, 1), :][0], 0.0)
        d = jnp.where(ok, cd_ref[pl.ds(k, 1), :][0], -1.0)

        fvx = ofvx_ref[:].reshape(F, S, BN)
        fvy = ofvy_ref[:].reshape(F, S, BN)
        fvz = ofvz_ref[:].reshape(F, S, BN)
        nv = onv_ref[:]

        m = slot < nv[:, None, :]
        dist = fvx * nx + fvy * ny + fvz * nz + d                 # (F,S,BN)
        removed = m & (dist > tol)

        @pl.when(jnp.any(removed))
        def _update():
            pnx, pny, pnz, pd = (
                opnx_ref[:], opny_ref[:], opnz_ref[:], opd_ref[:]
            )
            is_last = slot == (nv[:, None, :] - 1)

            def nxt(a):
                r = jnp.concatenate([a[:, 1:, :], a[:, 0:1, :]], axis=1)
                return jnp.where(is_last, a[:, 0:1, :], r)

            vnx, vny, vnz = nxt(fvx), nxt(fvy), nxt(fvz)
            dn = nxt(dist)

            kept = m & (dist <= tol)
            denom = dn - dist
            safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
            pcx = (fvx * dn - vnx * dist) / safe
            pcy = (fvy * dn - vny * dist) / safe
            pcz = (fvz * dn - vnz * dist) / safe

            # --- Cyclic-run emission (convex-specific Sutherland–Hodgman).
            # A plane cuts a CONVEX face loop in at most two edges: the kept
            # vertices form one contiguous cyclic run, the exit crossing
            # (kept→removed edge) follows the run, the enter crossing
            # (removed→kept edge) precedes it. Output (a valid rotation of
            # the stream the XLA fold emits): [v_a … v_b, exit, enter].
            # This replaces the O(S²) one-hot compaction with one masked
            # reduction per quantity + a log-step barrel rotation.
            cross_exit = m & (dist < -tol) & (dn > tol)
            cross_enter = m & (dist > tol) & (dn < -tol)
            f_ex = cross_exit.astype(f32)
            f_en = cross_enter.astype(f32)
            exit_x = jnp.sum(f_ex * pcx, axis=1)                 # (F,BN)
            exit_y = jnp.sum(f_ex * pcy, axis=1)
            exit_z = jnp.sum(f_ex * pcz, axis=1)
            enter_x = jnp.sum(f_en * pcx, axis=1)
            enter_y = jnp.sum(f_en * pcy, axis=1)
            enter_z = jnp.sum(f_en * pcz, axis=1)
            has_exit = jnp.any(cross_exit, axis=1)               # (F,BN)
            has_enter = jnp.any(cross_enter, axis=1)
            ex_i = has_exit.astype(jnp.int32)
            en_i = has_enter.astype(jnp.int32)

            # Run start a = the kept vertex whose cyclic predecessor is
            # removed (unique for a convex cut; 0 when the face is intact).
            kept_i = kept.astype(jnp.int32)
            kprev_last = jnp.sum(
                jnp.where(is_last, kept_i, 0), axis=1
            )                                                    # kept[nv-1]
            kprev = jnp.concatenate(
                [kprev_last[:, None, :], kept_i[:, :-1, :]], axis=1
            )
            startm = kept & (kprev == 0)
            a = jnp.sum(jnp.where(startm, slot, 0), axis=1)      # (F,BN)
            mcnt = jnp.sum(kept_i, axis=1)

            # rot[j] = fv[(a+j) mod nv]: a left barrel shift by a for
            # j < nv−a, a right barrel shift by nv−a for the wrapped tail.
            b_amt = jnp.where(a > 0, nv - a, 0)

            def rotate(x):
                xl = x
                xr = x
                t = 1
                while t < S:
                    bit_l = ((a3 // t) % 2) > 0
                    moved_l = jnp.concatenate(
                        [xl[:, t:, :], jnp.zeros((F, t, BN), x.dtype)], axis=1
                    )
                    xl = jnp.where(bit_l, moved_l, xl)
                    bit_r = ((b3 // t) % 2) > 0
                    moved_r = jnp.concatenate(
                        [jnp.zeros((F, t, BN), x.dtype), xr[:, : S - t, :]],
                        axis=1,
                    )
                    xr = jnp.where(bit_r, moved_r, xr)
                    t *= 2
                return jnp.where(slot < b_amt[:, None, :], xl, xr)

            a3 = a[:, None, :]
            b3 = b_amt[:, None, :]
            rotx, roty, rotz = rotate(fvx), rotate(fvy), rotate(fvz)

            in_run = slot < mcnt[:, None, :]
            at_exit = (slot == mcnt[:, None, :]) & has_exit[:, None, :]
            at_enter = (
                slot == (mcnt + ex_i)[:, None, :]
            ) & has_enter[:, None, :]

            def emit(rot, epx, enx):
                return jnp.where(
                    in_run,
                    rot,
                    jnp.where(
                        at_exit,
                        epx[:, None, :],
                        jnp.where(at_enter, enx[:, None, :], 0.0),
                    ),
                )

            out_fvx = emit(rotx, exit_x, enter_x)
            out_fvy = emit(roty, exit_y, enter_y)
            out_fvz = emit(rotz, exit_z, enter_z)
            n_out = jnp.minimum(mcnt + ex_i + en_i, S)
            new_nv = jnp.where(n_out >= 3, n_out, 0)

            # --- cap construction. In-plane basis (u, v) for angular
            # ordering (shared by both paths below).
            nl = jnp.sqrt(nx * nx + ny * ny + nz * nz)
            nls = jnp.maximum(nl, 1e-30)
            ux_n, uy_n, uz_n = nx / nls, ny / nls, nz / nls
            ax_, ay_, az_ = jnp.abs(ux_n), jnp.abs(uy_n), jnp.abs(uz_n)
            tx = (ax_ <= ay_) & (ax_ <= az_)
            ty = ~tx & (ay_ <= az_)
            ex = tx.astype(f32)
            ey = ty.astype(f32)
            ez = (~tx & ~ty).astype(f32)
            # u = e × n, normalized; v = n × u.
            ux = ey * uz_n - ez * uy_n
            uy = ez * ux_n - ex * uz_n
            uz = ex * uy_n - ey * ux_n
            ul = jnp.maximum(jnp.sqrt(ux * ux + uy * uy + uz * uz), 1e-30)
            ux, uy, uz = ux / ul, uy / ul, uz / ul
            vx = uy_n * uz - uz_n * uy
            vy = uz_n * ux - ux_n * uz
            vz = ux_n * uy - uy_n * ux

            def angle_rank_compact(qx, qy, qz, qm_i32, P, piota, OS):
                """Angle-sort masked candidates (P,BN) into (OS,BN) slots.

                qm int32 mask; returns sorted x/y/z (OS,BN) + count (BN,).
                Entries past OS (or masked) are dropped in angle order."""
                qm = qm_i32 > 0
                cnt = jnp.sum(qm_i32, axis=0)                     # (BN,)
                fcnt = jnp.maximum(cnt.astype(f32), 1.0)
                cx = jnp.sum(jnp.where(qm, qx, 0.0), axis=0) / fcnt
                cy = jnp.sum(jnp.where(qm, qy, 0.0), axis=0) / fcnt
                cz = jnp.sum(jnp.where(qm, qz, 0.0), axis=0) / fcnt
                rx, ry, rz = qx - cx[None], qy - cy[None], qz - cz[None]
                pu = rx * ux[None] + ry * uy[None] + rz * uz[None]
                pv = rx * vx[None] + ry * vy[None] + rz * vz[None]
                # Diamond pseudo-angle: same cyclic order as atan2(pv, pu).
                den = jnp.maximum(jnp.abs(pu) + jnp.abs(pv), 1e-30)
                ang = jnp.where(pv >= 0, 1.0 - pu / den, 3.0 + pu / den)
                key = jnp.where(qm, ang, 3.4e38)
                # Rank by (key, index) — unique, stable for equal keys.
                lt = key[:, None, :] < key[None, :, :]            # (P,P,BN)
                eq = key[:, None, :] == key[None, :, :]
                lower = piota[:, None, :] < piota[None, :, :]
                rank = jnp.sum((lt | (eq & lower)).astype(jnp.int32), axis=0)
                selc = qm[None] & (
                    rank[None]
                    == jax.lax.broadcasted_iota(jnp.int32, (OS, P, BN), 0)
                )
                w = selc.astype(f32)
                sx_ = jnp.sum(w * qx[None], axis=1)               # (OS,BN)
                sy_ = jnp.sum(w * qy[None], axis=1)
                sz_ = jnp.sum(w * qz[None], axis=1)
                return sx_, sy_, sz_, jnp.minimum(cnt, OS)

            face_touched = jnp.any(removed, axis=1)              # (F,BN)
            inplane = m & (jnp.abs(dist) <= tol) & face_touched[:, None, :]
            ip_any = jnp.any(inplane)

            def cap_fast(_):
                # No in-plane vertices anywhere in the block: every cap
                # vertex is the exit crossing of exactly one cut face (its
                # twin is the neighbor's enter — same bits, see pcx
                # symmetry), so the exit set IS the cap, deduped for free.
                # The data-dependent where forces a fresh canonically-laid-
                # out value — the raw axis-1 reduction outputs carry an
                # implicit-dim layout Mosaic cannot relayout through the
                # rank broadcasts below.
                canon = lambda q: jnp.where(iota_f >= 0, q, 0)
                return angle_rank_compact(
                    canon(exit_x), canon(exit_y), canon(exit_z),
                    canon(ex_i), F, iota_f, S,
                )

            def cap_slow(_):
                # Rare path (plane through a vertex): full candidate pool
                # [enter, exit, first in-plane, last in-plane] per face,
                # compacted to 2S, angle-sorted, bitwise-deduped.
                fslot = jnp.min(jnp.where(inplane, slot, S), axis=1)
                lslot = jnp.max(jnp.where(inplane, slot, -1), axis=1)
                fsel = (inplane & (slot == fslot[:, None, :])).astype(f32)
                lsel = (inplane & (slot == lslot[:, None, :])).astype(f32)
                ip_x = jnp.sum(fsel * fvx, axis=1)
                ip_y = jnp.sum(fsel * fvy, axis=1)
                ip_z = jnp.sum(fsel * fvz, axis=1)
                has_ip = (fslot < S).astype(jnp.int32)
                ip2_x = jnp.sum(lsel * fvx, axis=1)
                ip2_y = jnp.sum(lsel * fvy, axis=1)
                ip2_z = jnp.sum(lsel * fvz, axis=1)
                has_ip2 = (lslot > fslot).astype(jnp.int32)

                # Flatten (F, 4) → (F·4,) then compact across faces to 2S
                # slots. int32 masks, not bool: Mosaic cannot relayout i1
                # vectors through the stack+reshape.
                CK = 4
                px = jnp.stack(
                    [enter_x, exit_x, ip_x, ip2_x], axis=1
                ).reshape(F * CK, BN)
                py = jnp.stack(
                    [enter_y, exit_y, ip_y, ip2_y], axis=1
                ).reshape(F * CK, BN)
                pz = jnp.stack(
                    [enter_z, exit_z, ip_z, ip2_z], axis=1
                ).reshape(F * CK, BN)
                pm = jnp.stack(
                    [en_i, ex_i, has_ip, has_ip2], axis=1
                ).reshape(F * CK, BN) > 0
                gpos = _cumsum1(
                    pm.astype(jnp.int32)[:, None, :].reshape(1, F * CK, BN)
                )[0]
                cnt = jnp.minimum(jnp.max(gpos, axis=0), 2 * S)   # (BN,)
                selp = (
                    pm & (gpos[None] == pool_iota[:, None, :] + 1)
                ).astype(f32)
                gx = jnp.sum(selp * px[None], axis=1)             # (2S,BN)
                gy = jnp.sum(selp * py[None], axis=1)
                gz = jnp.sum(selp * pz[None], axis=1)
                gm_i = (pool_iota < cnt[None, :]).astype(jnp.int32)

                # Sort the full 2S pool (duplicates land adjacent), THEN
                # dedup, THEN compact to S — dedup must precede the S
                # truncation or kept duplicates could crowd out real tail
                # vertices.
                sx_, sy_, sz_, scnt = angle_rank_compact(
                    gx, gy, gz, gm_i, 2 * S, pool_iota, 2 * S
                )
                smask = pool_iota < scnt[None, :]
                prevx = jnp.concatenate(
                    [jnp.full_like(sx_[:1], 3.4e38), sx_[:-1]], 0
                )
                prevy = jnp.concatenate(
                    [jnp.full_like(sy_[:1], 3.4e38), sy_[:-1]], 0
                )
                prevz = jnp.concatenate(
                    [jnp.full_like(sz_[:1], 3.4e38), sz_[:-1]], 0
                )
                dup = (sx_ == prevx) & (sy_ == prevy) & (sz_ == prevz)
                keep = smask & ~dup
                kpos = _cumsum1(
                    keep.astype(jnp.int32)[None].reshape(1, 2 * S, BN)
                )[0]
                n_cap = jnp.minimum(jnp.max(kpos, axis=0), S)
                selc = (
                    keep[None] & (kpos[None] == cap_iota[:, None, :] + 1)
                ).astype(f32)
                capx = jnp.sum(selc * sx_[None], axis=1)
                capy = jnp.sum(selc * sy_[None], axis=1)
                capz = jnp.sum(selc * sz_[None], axis=1)
                return capx, capy, capz, n_cap

            def place_and_write(capx, capy, capz, n_cap):
                """Cap placement into the first free face slot + final ref
                writes. Called from exactly one of the two pl.when regions
                below (lax.cond can't unify the branches' vector layouts)."""
                has_cap = n_cap >= 3
                free = new_nv == 0                                    # (F,BN)
                first_free = jnp.min(jnp.where(free, iota_f, F), axis=0)
                can_place = has_cap & (first_free < F)
                put = (iota_f == first_free[None, :]) & can_place[None, :]
                put3 = put[:, None, :]
                new_fvx = jnp.where(put3, capx[None], out_fvx)
                new_fvy = jnp.where(put3, capy[None], out_fvy)
                new_fvz = jnp.where(put3, capz[None], out_fvz)
                nv2 = jnp.where(put, n_cap[None, :], new_nv)
                pnx2 = jnp.where(put, nx[None, :], pnx)
                pny2 = jnp.where(put, ny[None, :], pny)
                pnz2 = jnp.where(put, nz[None, :], pnz)
                pd2 = jnp.where(put, d[None, :], pd)

                # Degenerate wipe: <4 live faces clears the polytope.
                alive = (
                    jnp.sum((nv2 >= 3).astype(jnp.int32), axis=0) >= 4
                )                                                     # (BN,)
                nv2 = jnp.where(alive[None, :], nv2, 0)

                ofvx_ref[:] = new_fvx.reshape(F * S, BN)
                ofvy_ref[:] = new_fvy.reshape(F * S, BN)
                ofvz_ref[:] = new_fvz.reshape(F * S, BN)
                onv_ref[:] = nv2
                opnx_ref[:] = pnx2
                opny_ref[:] = pny2
                opnz_ref[:] = pnz2
                opd_ref[:] = pd2

            @pl.when(jnp.logical_not(ip_any))
            def _fast():
                place_and_write(*cap_fast(0))

            @pl.when(ip_any)
            def _slow():
                place_and_write(*cap_slow(0))

        return 0

    jax.lax.fori_loop(0, K, body, 0)


@functools.partial(
    jax.jit, static_argnames=("tol", "block", "interpret")
)
def clip_planes_batch_pallas(
    poly: ConvexPoly,
    planes: jax.Array,
    plane_mask: jax.Array,
    tol: float = DEFAULT_TOL,
    block: int = 128,
    interpret: bool = False,
) -> ConvexPoly:
    """Batched K-plane fold: poly batch (N, F, S), planes (N, K, 4).

    Drop-in batch equivalent of ``vmap(clip_poly_planes)``.
    """
    N, F, S = poly.face_verts.shape[0], poly.F, poly.S
    K = planes.shape[1]
    dtype = poly.face_verts.dtype

    BN = min(block, max(8, N))
    pad = (-N) % BN
    NP = N + pad

    def padN(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a

    fv = padN(poly.face_verts)
    nv = padN(poly.n_verts)
    pp = padN(poly.planes)
    pls = padN(planes)
    pms = padN(plane_mask)

    # Batch-minor planar layout.
    fvT = jnp.transpose(fv, (3, 1, 2, 0)).reshape(3, F * S, NP)
    nvT = jnp.transpose(nv, (1, 0))
    ppT = jnp.transpose(pp, (2, 1, 0))                       # (4, F, NP)
    clT = jnp.transpose(pls, (2, 1, 0))                      # (4, K, NP)
    cmT = jnp.transpose(pms.astype(jnp.int32), (1, 0))      # (K, NP)

    grid = (NP // BN,)
    bs = lambda r: pl.BlockSpec(
        (r, BN), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_shape = (
        jax.ShapeDtypeStruct((F * S, NP), dtype),
        jax.ShapeDtypeStruct((F * S, NP), dtype),
        jax.ShapeDtypeStruct((F * S, NP), dtype),
        jax.ShapeDtypeStruct((F, NP), jnp.int32),
        jax.ShapeDtypeStruct((F, NP), dtype),
        jax.ShapeDtypeStruct((F, NP), dtype),
        jax.ShapeDtypeStruct((F, NP), dtype),
        jax.ShapeDtypeStruct((F, NP), dtype),
    )
    outs = pl.pallas_call(
        functools.partial(_clip_kernel, F=F, S=S, K=K, tol=tol),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            # The unrolled one-hot compaction loops keep several (F,S,BN)
            # f32 temporaries live; the default 16 MB scoped-VMEM budget
            # overflows at F=32,S=16. v5e VMEM is 128 MB — allow more.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            bs(F * S), bs(F * S), bs(F * S),
            bs(F),
            bs(F), bs(F), bs(F), bs(F),
            bs(K), bs(K), bs(K), bs(K),
            bs(K),
        ],
        out_specs=tuple(
            bs(F * S) if i < 3 else bs(F) for i in range(8)
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        fvT[0], fvT[1], fvT[2],
        nvT,
        ppT[0], ppT[1], ppT[2], ppT[3],
        clT[0], clT[1], clT[2], clT[3],
        cmT,
    )
    ofvx, ofvy, ofvz, onv, opnx, opny, opnz, opd = outs
    fv_out = jnp.stack([ofvx, ofvy, ofvz], axis=0).reshape(3, F, S, NP)
    fv_out = jnp.transpose(fv_out, (3, 1, 2, 0))[:N]
    nv_out = jnp.transpose(onv, (1, 0))[:N]
    pl_out = jnp.stack([opnx, opny, opnz, opd], axis=0)
    pl_out = jnp.transpose(pl_out, (2, 1, 0))[:N]
    return ConvexPoly(fv_out, nv_out, pl_out)


def _target_is_tpu() -> bool:
    """True when tracing targets a TPU device.

    ``jax.default_backend()`` ignores an active ``jax.default_device(...)``
    context (it reports the highest-priority platform), so consult the
    config'd default device first — the multichip dryrun and the CPU-mesh
    sharding tests run under ``jax.default_device(cpu)`` with the axon TPU
    plugin still registered as the ambient default backend.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        platform = getattr(dev, "platform", None)
        return platform in ("tpu", "axon")
    return jax.default_backend() == "tpu"


def clip_planes_batch(
    poly: ConvexPoly,
    planes: jax.Array,
    plane_mask: jax.Array | None = None,
    tol: float = DEFAULT_TOL,
) -> ConvexPoly:
    """Batched plane fold with backend dispatch.

    TPU → the Pallas VMEM kernel; other backends → the XLA scan fold
    (``ops.clip.clip_poly_planes`` under vmap).
    """
    from surtr_tpu.ops.clip import clip_poly_planes

    N, K = planes.shape[0], planes.shape[1]
    if plane_mask is None:
        plane_mask = jnp.ones((N, K), bool)
    if _target_is_tpu():
        return clip_planes_batch_pallas(poly, planes, plane_mask, tol=tol)
    return jax.vmap(
        lambda p, pls, pm: clip_poly_planes(p, pls, pm, tol)
    )(poly, planes, plane_mask)
