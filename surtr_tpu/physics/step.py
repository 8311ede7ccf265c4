"""The jitted rigid-body step — the replacement for PhysX's
``simulate(1/120)/fetchResults`` (/root/reference/Src/Surtr.cpp:330-331).

One call = one fixed 1/120 s step, entirely on device:
  1. world hull transform (VPU broadcast rotations),
  2. blocked k-nearest AABB broadphase, symmetrized to *mutual* candidate
     lists,
  3. narrowphase: SAT over the 26-DOP axis set + both pieces' face normals;
     contacts live in a fixed piece-major (Np, K+G) slot layout — every piece
     owns its K pair slots and G ground slots,
  4. Jacobi projected-impulse solver with mass splitting, Baumgarte bias,
     Coulomb friction μ=0.5, restitution 0.1 (PxMaterial parity,
     Surtr.cpp:1160). Each side of a mutual pair computes the same impulse
     and applies only its own half — so the whole solver is reshape-sums and
     plain gathers: NO scatter anywhere (TPU batched scatters cost ~40 ms;
     see ops/clip.py performance note),
  5. symplectic Euler integration with quaternion renormalization.

Piece→body reduction uses the sorted-owner segmented-cumsum trick: build_scene
sorts pieces by owner, so a body's sum is a difference of two cumsum reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from surtr_tpu.config import PhysicsConfig
from surtr_tpu.ops.kdop import dop26_directions
from surtr_tpu.ops.linalg import matvec3
from surtr_tpu.physics.rigid import quat_integrate, quat_to_mat, world_inv_inertia
from surtr_tpu.physics.scene import PhysicsScene, piece_world_verts

BIG = 3.4e38


def _broadphase(centers, lo, hi, owner, valid, K, block):
    """Top-K nearest overlapping candidates per piece; (Np, K) idx + mask."""
    Np = centers.shape[0]
    nblk = (Np + block - 1) // block
    pad = nblk * block - Np
    rows = jnp.arange(block)
    cpad = jnp.pad(centers, ((0, pad), (0, 0)))
    lopad = jnp.pad(lo, ((0, pad), (0, 0)))
    hipad = jnp.pad(hi, ((0, pad), (0, 0)))
    ownpad = jnp.pad(owner, (0, pad), constant_values=-2)
    valpad = jnp.pad(valid, (0, pad))

    def one_block(b):
        r0 = b * block
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r0, block)
        c, lo_r, hi_r = sl(cpad), sl(lopad), sl(hipad)
        own_r, val_r = sl(ownpad), sl(valpad)
        gidx = r0 + rows
        overlap = jnp.all(
            (lo_r[:, None] <= hi[None]) & (lo[None] <= hi_r[:, None]), axis=-1
        )
        ok = (
            overlap
            & (own_r[:, None] != owner[None, :])
            & val_r[:, None]
            & valid[None, :]
            & (gidx[:, None] != jnp.arange(Np)[None, :])
        )
        d2 = jnp.sum((c[:, None] - centers[None]) ** 2, axis=-1)
        score = jnp.where(ok, -d2, -BIG)
        kk = min(K, Np)
        neg, idx = jax.lax.top_k(score, kk)
        if kk < K:
            neg = jnp.pad(neg, ((0, 0), (0, K - kk)), constant_values=-BIG)
            idx = jnp.pad(idx, ((0, 0), (0, K - kk)))
        return idx, neg > -BIG / 2

    idx, ok = jax.lax.map(one_block, jnp.arange(nblk))
    return idx.reshape(-1, K)[:Np], ok.reshape(-1, K)[:Np]


def _morton(centers, valid):
    """30-bit Morton code of quantized centers; invalid rows sort last."""
    big = jnp.asarray(BIG, centers.dtype)
    lo = jnp.min(jnp.where(valid[:, None], centers, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], centers, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(
        ((centers - lo) / ext * 1023.0).astype(jnp.int32), 0, 1023
    )  # (Np, 3)

    def spread(x):
        # 10 bits → every 3rd bit (classic bit-spread).
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.where(valid, code, jnp.int32(0x7FFFFFFF))


def _broadphase_sorted(centers, lo, hi, owner, valid, K, window):
    """Morton-window broadphase: sort by Morton code, test the ±window
    sorted neighbors exactly (AABB overlap), keep the K nearest.

    O(Np·window) instead of the blocked O(Np²) sweep. The window bounds
    locality: spatial neighbors that land > window apart in Morton order are
    missed — the same kind of capacity approximation as the K-neighbor cap
    itself (PhysX's exact SAP has no reference source to mirror; SURVEY §7
    hard-part 5)."""
    Np = centers.shape[0]
    code = _morton(centers, valid)
    order = jnp.argsort(code)                       # (Np,) sorted → original
    inv = jnp.argsort(order)                        # original → rank

    # Sorted-domain copies.
    c_s = centers[order]
    lo_s, hi_s = lo[order], hi[order]
    own_s, val_s = owner[order], valid[order]

    r = jnp.arange(Np, dtype=jnp.int32)
    deltas = jnp.concatenate(
        [jnp.arange(1, window + 1, dtype=jnp.int32),
         -jnp.arange(1, window + 1, dtype=jnp.int32)]
    )                                                # (2W,)
    cand = r[:, None] + deltas[None, :]              # (Np, 2W)
    in_rng = (cand >= 0) & (cand < Np)
    cand_c = jnp.clip(cand, 0, Np - 1)

    pack = jnp.concatenate(
        [c_s, lo_s, hi_s, own_s[:, None].astype(c_s.dtype),
         val_s[:, None].astype(c_s.dtype)],
        axis=1,
    )                                                # (Np, 11)
    pj = pack[cand_c]                                # (Np, 2W, 11)
    cj, loj, hij = pj[..., 0:3], pj[..., 3:6], pj[..., 6:9]
    ownj = pj[..., 9].astype(jnp.int32)
    valj = pj[..., 10] > 0.5

    overlap = jnp.all((lo_s[:, None] <= hij) & (loj <= hi_s[:, None]), -1)
    ok = (
        overlap & in_rng & valj & val_s[:, None]
        & (ownj != own_s[:, None])
    )
    d2 = jnp.sum((c_s[:, None] - cj) ** 2, axis=-1)
    score = jnp.where(ok, -d2, -BIG)
    kk = min(K, deltas.shape[0])
    neg, kidx = jax.lax.top_k(score, kk)             # (Np, kk) into 2W
    if kk < K:
        neg = jnp.pad(neg, ((0, 0), (0, K - kk)), constant_values=-BIG)
        kidx = jnp.pad(kidx, ((0, 0), (0, K - kk)))
    part_rank = jnp.take_along_axis(cand_c, kidx, axis=1)   # sorted idx
    part_orig = order[part_rank]                     # (Np, K) original idx
    pok_s = neg > -BIG / 2

    # Back to original piece order.
    pidx = part_orig[inv]
    pok = pok_s[inv]
    return pidx, pok


def _stage_out(scene: PhysicsScene, *arrays) -> PhysicsScene:
    """Profiling early-exit: fold a reduction of the stage outputs into
    bodies.x so the truncated program keeps the stage's compute live."""
    import dataclasses

    s = jnp.float32(0)
    for a in arrays:
        s = s + jnp.sum(a.astype(jnp.float32))
    bodies = scene.bodies
    new_bodies = type(bodies)(
        x=bodies.x + s.astype(bodies.x.dtype) * 1e-30,
        q=bodies.q, v=bodies.v, w=bodies.w,
        inv_mass=bodies.inv_mass,
        inv_inertia_body=bodies.inv_inertia_body,
        active=bodies.active,
    )
    return dataclasses.replace(scene, bodies=new_bodies)


def _segment_sums(piece_vals: jax.Array, seg_start: jax.Array):
    """Per-body sums of piece values when pieces are sorted by owner.

    piece_vals: (Np, D); seg_start: (B+1,) start offsets. Returns (B, D).
    Pure cumsum + two gathers — no scatter."""
    csum = jnp.concatenate(
        [jnp.zeros_like(piece_vals[:1]), jnp.cumsum(piece_vals, axis=0)]
    )
    return csum[seg_start[1:]] - csum[seg_start[:-1]]


@functools.partial(jax.jit, static_argnames=("cfg", "profile_stage"))
def physics_step(
    scene: PhysicsScene, cfg: PhysicsConfig, profile_stage: int = 99
) -> PhysicsScene:
    """One fixed step. ``profile_stage`` truncates the step after stage N
    (1=transforms, 2=broadphase, 3=narrowphase, 4=solver) for per-phase device
    timing (SURVEY §5 tracing) — production callers leave the default."""
    dt = cfg.dt
    bodies = scene.bodies
    Np, B = scene.Np, scene.B
    K = cfg.max_neighbors
    G = cfg.max_ground_contacts
    C = K + G

    # --- 1. world transforms
    wverts, wmask = piece_world_verts(scene)                   # (Np, Vh, 3)
    owner = jnp.clip(scene.piece_owner, 0, B - 1)
    pvalid = scene.piece_valid & (scene.piece_owner >= 0)
    big = jnp.asarray(BIG, wverts.dtype)
    lo = jnp.min(jnp.where(wmask[..., None], wverts, big), axis=1)
    hi = jnp.max(jnp.where(wmask[..., None], wverts, -big), axis=1)
    margin = cfg.contact_slop * 4.0
    lo, hi = lo - margin, hi + margin
    centers = jnp.where(pvalid[:, None], (lo + hi) * 0.5, big)

    if profile_stage <= 1:
        return _stage_out(scene, centers, lo, hi)

    # --- 2. broadphase, symmetrized (contact only when both sides list it).
    if cfg.broadphase == "sorted":
        pidx, pok = _broadphase_sorted(
            centers, lo, hi, scene.piece_owner, pvalid, K,
            cfg.broadphase_window,
        )
    else:
        pidx, pok = _broadphase(
            centers, lo, hi, scene.piece_owner, pvalid, K,
            cfg.broadphase_block,
        )
    partner_lists = pidx[pidx]                     # (Np, K, K)
    me = jnp.arange(Np, dtype=jnp.int32)[:, None, None]
    mutual = jnp.any(partner_lists == me, axis=-1)
    pok = pok & mutual

    if profile_stage <= 2:
        return _stage_out(scene, pidx, pok)

    # --- 3a. pair narrowphase (SAT), piece-major slots (Np, K).
    from surtr_tpu.ops.linalg import rot_points

    Rw = quat_to_mat(bodies.q)[owner]
    wplanes_n = rot_points(Rw, scene.piece_planes[..., :3])    # (Np, F, 3)
    base = dop26_directions(wverts.dtype)                      # (13, 3)

    # Gather-count discipline: each big batched gather costs ~ms on the
    # tunnel regardless of payload, so the j-side hull data is packed into
    # ONE contiguous array and gathered once; the i-side needs no gather at
    # all (broadcast along the K axis).
    Vh = wverts.shape[1]
    Fp = wplanes_n.shape[1]
    packed = jnp.concatenate(
        [
            wverts.reshape(Np, Vh * 3),
            wmask.astype(wverts.dtype),
            wplanes_n.reshape(Np, Fp * 3),
            scene.piece_pmask.astype(wverts.dtype),
        ],
        axis=1,
    )                                                          # (Np, D)
    pj = packed[pidx]                                          # (Np, K, D)
    o = 0
    jverts = pj[..., o : o + Vh * 3].reshape(Np, K, Vh, 3); o += Vh * 3
    jmask = pj[..., o : o + Vh] > 0.5; o += Vh
    jplanes = pj[..., o : o + Fp * 3].reshape(Np, K, Fp, 3); o += Fp * 3
    jpmask = pj[..., o : o + Fp] > 0.5

    nA = base.shape[0]
    D = nA + 2 * Fp
    axes = jnp.concatenate(
        [
            jnp.broadcast_to(base[None, None], (Np, K, nA, 3)),
            jnp.broadcast_to(wplanes_n[:, None], (Np, K, Fp, 3)),
            jplanes,
        ],
        axis=2,
    )                                                          # (Np, K, D, 3)
    amask = jnp.concatenate(
        [
            jnp.ones((Np, K, nA), bool),
            jnp.broadcast_to(scene.piece_pmask[:, None], (Np, K, Fp)),
            jpmask,
        ],
        axis=2,
    )
    # Supports of i (broadcast) and j along all D axes.
    si = jnp.sum(
        wverts[:, None, :, None, :] * axes[:, :, None, :, :], axis=-1
    )                                                          # (Np, K, Vh, D)
    sj = jnp.sum(jverts[..., None, :] * axes[:, :, None, :, :], axis=-1)
    mi = wmask[:, None, :, None]
    mj = jmask[..., None]
    si_max = jnp.max(jnp.where(mi, si, -BIG), axis=2)
    si_min = jnp.min(jnp.where(mi, si, BIG), axis=2)
    sj_max = jnp.max(jnp.where(mj, sj, -BIG), axis=2)
    sj_min = jnp.min(jnp.where(mj, sj, BIG), axis=2)
    ov = jnp.minimum(si_max, sj_max) - jnp.maximum(si_min, sj_min)
    ov = jnp.where(amask, ov, BIG)                             # (Np, K, D)
    a = jnp.argmin(ov, axis=-1)
    depth = jnp.take_along_axis(ov, a[..., None], axis=-1)[..., 0]
    axis_sel = jnp.take_along_axis(
        axes, a[..., None, None], axis=2
    )[..., 0, :]                                               # (Np, K, 3)
    mid_i = jnp.take_along_axis(si_max + si_min, a[..., None], -1)[..., 0]
    mid_j = jnp.take_along_axis(sj_max + sj_min, a[..., None], -1)[..., 0]
    flip = mid_i < mid_j
    pc_n = jnp.where(flip[..., None], -axis_sel, axis_sel)
    # Deepest supports along the contact normal.
    ti = jnp.sum(wverts[:, None] * -pc_n[:, :, None, :], axis=-1)
    tj = jnp.sum(jverts * pc_n[:, :, None, :], axis=-1)
    pi_idx = jnp.argmax(jnp.where(wmask[:, None], ti, -BIG), axis=-1)  # (Np, K)
    pj_idx = jnp.argmax(jnp.where(jmask, tj, -BIG), axis=-1)
    pi_pt = jnp.take_along_axis(wverts, pi_idx[..., None], axis=1)  # (Np, K, 3)
    pj_pt = jnp.take_along_axis(
        jverts, pj_idx[..., None, None], axis=2
    )[:, :, 0, :]
    pc_p = 0.5 * (pi_pt + pj_pt)
    pc_hit = pok & (depth > -cfg.contact_slop) & (depth < BIG / 2)
    pc_d = jnp.maximum(depth, 0.0)

    # --- 3b. ground contacts: deepest G verts below y = ground_y.
    depth_v = cfg.ground_y - wverts[..., 1]
    below = wmask & (depth_v > -cfg.contact_slop)
    gd, gidx = jax.lax.top_k(jnp.where(below, depth_v, -BIG), G)
    g_hit = (gd > -cfg.contact_slop) & pvalid[:, None]
    g_pts = jnp.take_along_axis(wverts, gidx[..., None], axis=1)
    up = jnp.zeros((Np, G, 3), wverts.dtype).at[..., 1].set(1.0)

    # --- assemble (Np, C) contact slots.
    nrm = jnp.concatenate([pc_n, up], axis=1)
    pts = jnp.concatenate([pc_p, g_pts], axis=1)
    dep = jnp.concatenate([pc_d, jnp.maximum(gd, 0.0)], axis=1)
    hit = jnp.concatenate([pc_hit, g_hit], axis=1)
    partner_piece = jnp.concatenate(
        [pidx, jnp.full((Np, G), -1, jnp.int32)], axis=1
    )
    is_static = partner_piece < 0
    partner_body = jnp.where(
        is_static, 0, owner[jnp.maximum(partner_piece, 0)]
    )

    if profile_stage <= 3:
        return _stage_out(scene, nrm, pts, dep, hit)

    # --- 4. solver (Jacobi, A-side application only; pairs are mutual).
    inv_m = bodies.inv_mass
    inv_I = world_inv_inertia(bodies.q, bodies.inv_inertia_body)
    gravity = jnp.array([0.0, cfg.gravity, 0.0], wverts.dtype)
    v0 = bodies.v + dt * gravity * (inv_m > 0)[:, None]
    w0 = bodies.w

    myb = owner                                               # (Np,)
    rA = pts - bodies.x[myb][:, None]                         # (Np, C, 3)
    rB = pts - bodies.x[partner_body]                         # (Np, C, 3)
    iA_m = inv_m[myb][:, None]                                # (Np, 1)
    iB_m = jnp.where(is_static, 0.0, inv_m[partner_body])
    iA_I = inv_I[myb][:, None]                                # (Np, 1, 3, 3)
    iB_I = jnp.where(
        is_static[..., None, None], 0.0, inv_I[partner_body]
    )

    def k_term(im, iI, r, n):
        rxn = jnp.cross(r, n)
        return im + jnp.sum(rxn * matvec3(iI, rxn), -1)

    kn = k_term(iA_m, iA_I, rA, nrm) + k_term(iB_m, iB_I, rB, nrm)
    m_eff = jnp.where(hit & (kn > 1e-12), 1.0 / jnp.maximum(kn, 1e-12), 0.0)

    def rel_vel2(v, w):
        vA = v[myb][:, None] + jnp.cross(
            jnp.broadcast_to(w[myb][:, None], rA.shape), rA
        )
        vB = jnp.where(
            is_static[..., None],
            0.0,
            v[partner_body] + jnp.cross(w[partner_body], rB),
        )
        return vA - vB

    vn0 = jnp.sum(rel_vel2(v0, w0) * nrm, axis=-1)
    bounce = -cfg.restitution * jnp.minimum(vn0 + 0.25, 0.0)
    bias = (cfg.baumgarte / dt) * jnp.maximum(dep - cfg.contact_slop, 0.0)
    target = jnp.maximum(bounce, bias)

    # Mass splitting: per-body contact counts (pair contacts count once per
    # side; both sides carry the slot, so totals match the scatter version).
    seg = scene.seg_start
    cnt_piece = jnp.sum(hit, axis=1, keepdims=True).astype(wverts.dtype)
    cnt_body = _segment_sums(cnt_piece, seg)[:, 0]             # (B,)
    split_body = 1.0 / jnp.maximum(cnt_body, 1.0)

    mu = cfg.dynamic_friction

    def solver_iter(carry, _):
        v, w = carry
        vr = rel_vel2(v, w)
        vn = jnp.sum(vr * nrm, axis=-1)
        lam_n = jnp.maximum(-(vn - target) * m_eff, 0.0)
        vt = vr - vn[..., None] * nrm
        vt_len = jnp.linalg.norm(vt, axis=-1)
        t_dir = vt / jnp.maximum(vt_len, 1e-9)[..., None]
        lam_t = jnp.minimum(vt_len * m_eff, mu * lam_n)
        imp = jnp.where(
            hit[..., None], lam_n[..., None] * nrm - lam_t[..., None] * t_dir, 0.0
        )                                                      # (Np, C, 3)
        sA = split_body[myb][:, None, None]
        piece_dv = jnp.sum(imp, axis=1) * iA_m * split_body[myb][:, None]
        dw_terms = matvec3(
            jnp.broadcast_to(iA_I, rA.shape[:2] + (3, 3)), jnp.cross(rA, imp)
        )
        piece_dw = jnp.sum(dw_terms * sA, axis=1)
        v = v + _segment_sums(piece_dv, seg)
        w = w + _segment_sums(piece_dw, seg)
        return (v, w), None

    (v1, w1), _ = jax.lax.scan(
        solver_iter, (v0, w0), None, length=cfg.solver_iters
    )

    if profile_stage <= 4:
        return _stage_out(scene, v1, w1)

    # --- 5. integrate
    act = bodies.active
    v1 = jnp.where(act[:, None], v1, 0.0)
    w1 = jnp.where(act[:, None], w1, 0.0)
    x1 = bodies.x + dt * v1
    q1 = quat_integrate(bodies.q, w1, dt)

    new_bodies = type(bodies)(
        x=x1, q=q1, v=v1, w=w1,
        inv_mass=bodies.inv_mass,
        inv_inertia_body=bodies.inv_inertia_body,
        active=act,
    )
    import dataclasses

    return dataclasses.replace(scene, bodies=new_bodies)
