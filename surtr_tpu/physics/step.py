"""The jitted rigid-body step — the replacement for PhysX's
``simulate(1/120)/fetchResults`` (/root/reference/Src/Surtr.cpp:330-331).

One call = one fixed 1/120 s step, entirely on device:
  1. world hull transform (batched matmuls),
  2. blocked k-nearest AABB broadphase (no N² materialization),
  3. narrowphase: SAT over the 26-DOP axis set + both pieces' face normals;
     one contact per pair, up to ``max_ground_contacts`` per piece vs the
     ground plane (PxPlane(0,1,0,2) parity, Surtr.cpp:1527),
  4. Jacobi projected-impulse solver with mass splitting, Baumgarte bias,
     Coulomb friction μ=0.5 and restitution 0.1 (PxMaterial parity,
     Surtr.cpp:1160),
  5. symplectic Euler integration with quaternion renormalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from surtr_tpu.config import PhysicsConfig
from surtr_tpu.ops.kdop import dop26_directions
from surtr_tpu.physics.rigid import quat_integrate, quat_to_mat, world_inv_inertia
from surtr_tpu.physics.scene import PhysicsScene, piece_world_verts

BIG = 3.4e38


def _broadphase(centers, lo, hi, owner, valid, K, block):
    """Top-K nearest overlapping candidates per piece.

    Returns (Np, K) partner indices and (Np, K) validity. Blocked over rows so
    the (Np, Np) distance matrix is never materialized at once.
    """
    Np = centers.shape[0]
    nblk = (Np + block - 1) // block
    pad = nblk * block - Np
    cpad = jnp.pad(centers, ((0, pad), (0, 0)))
    rows = jnp.arange(block)

    def one_block(b):
        r0 = b * block
        c = jax.lax.dynamic_slice_in_dim(cpad, r0, block)      # (blk, 3)
        lo_r = jax.lax.dynamic_slice_in_dim(
            jnp.pad(lo, ((0, pad), (0, 0))), r0, block
        )
        hi_r = jax.lax.dynamic_slice_in_dim(
            jnp.pad(hi, ((0, pad), (0, 0))), r0, block
        )
        own_r = jax.lax.dynamic_slice_in_dim(
            jnp.pad(owner, (0, pad), constant_values=-2), r0, block
        )
        val_r = jax.lax.dynamic_slice_in_dim(
            jnp.pad(valid, (0, pad)), r0, block
        )
        gidx = r0 + rows
        overlap = jnp.all(
            (lo_r[:, None] <= hi[None]) & (lo[None] <= hi_r[:, None]), axis=-1
        )                                                      # (blk, Np)
        same_body = own_r[:, None] == owner[None, :]
        ok = (
            overlap
            & ~same_body
            & val_r[:, None]
            & valid[None, :]
            & (gidx[:, None] != jnp.arange(Np)[None, :])
        )
        d2 = jnp.sum((c[:, None] - centers[None]) ** 2, axis=-1)
        score = jnp.where(ok, -d2, -BIG)
        kk = min(K, Np)
        neg, idx = jax.lax.top_k(score, kk)
        if kk < K:  # tiny scenes: pad out to K partners
            neg = jnp.pad(neg, ((0, 0), (0, K - kk)), constant_values=-BIG)
            idx = jnp.pad(idx, ((0, 0), (0, K - kk)))
        return idx, neg > -BIG / 2

    idx, ok = jax.lax.map(one_block, jnp.arange(nblk))
    return idx.reshape(-1, K)[:Np], ok.reshape(-1, K)[:Np]


def _support(verts, vmask, axes):
    """Max of verts·axes over masked verts. verts (V,3), axes (D,3) → (D,)."""
    from surtr_tpu.ops.linalg import supports

    t = supports(verts, axes)  # VPU broadcast; vmapped over pairs
    return jnp.max(jnp.where(vmask[:, None], t, -BIG), axis=0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def physics_step(scene: PhysicsScene, cfg: PhysicsConfig) -> PhysicsScene:
    dt = cfg.dt
    bodies = scene.bodies
    Np, B = scene.Np, scene.B
    K = cfg.max_neighbors
    G = cfg.max_ground_contacts

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

    # --- 2. broadphase
    pidx, pok = _broadphase(
        centers, lo, hi, scene.piece_owner, pvalid, K, cfg.broadphase_block
    )

    # --- 3a. pair narrowphase (SAT)
    from surtr_tpu.ops.linalg import matvec3, rot_points

    Rw = quat_to_mat(bodies.q)[owner]                          # (Np, 3, 3)
    wplanes_n = rot_points(Rw, scene.piece_planes[..., :3])
    base = dop26_directions(wverts.dtype)                      # (13, 3)

    def pair_contact(i, j, ok):
        # Candidate axes: 13 fixed + face normals of both pieces.
        axes = jnp.concatenate(
            [base, wplanes_n[i], wplanes_n[j]], axis=0
        )                                                      # (13+2F, 3)
        amask = jnp.concatenate(
            [
                jnp.ones((base.shape[0],), bool),
                scene.piece_pmask[i],
                scene.piece_pmask[j],
            ]
        )
        si_max = _support(wverts[i], wmask[i], axes)
        si_min = -_support(wverts[i], wmask[i], -axes)
        sj_max = _support(wverts[j], wmask[j], axes)
        sj_min = -_support(wverts[j], wmask[j], -axes)
        # overlap along axis a: min(hi_i, hi_j) - max(lo_i, lo_j)
        ov = jnp.minimum(si_max, sj_max) - jnp.maximum(si_min, sj_min)
        ov = jnp.where(amask, ov, BIG)
        a = jnp.argmin(ov)
        depth = ov[a]
        axis = axes[a]
        # Normal points from j to i if i sits on the + side of the axis.
        flip = (si_max + si_min) < (sj_max + sj_min)
        n = jnp.where(flip[a], -axis, axis)
        # Contact point: midpoint of the two deepest supports.
        ti = jnp.sum(wverts[i] * -n, axis=-1)
        tj = jnp.sum(wverts[j] * n, axis=-1)
        pi = wverts[i][jnp.argmax(jnp.where(wmask[i], ti, -BIG))]
        pj = wverts[j][jnp.argmax(jnp.where(wmask[j], tj, -BIG))]
        point = 0.5 * (pi + pj)
        hit = ok & (depth > -cfg.contact_slop) & (depth < BIG / 2)
        return n, point, jnp.maximum(depth, 0.0), hit

    flat_i = jnp.repeat(jnp.arange(Np, dtype=jnp.int32), K)
    flat_j = pidx.reshape(-1)
    flat_ok = pok.reshape(-1) & (flat_i < flat_j)  # dedupe symmetric pairs
    pc_n, pc_p, pc_d, pc_hit = jax.vmap(pair_contact)(flat_i, flat_j, flat_ok)

    # --- 3b. ground contacts: deepest G verts below the plane y = ground_y.
    depth_v = cfg.ground_y - wverts[..., 1]                    # (Np, Vh)
    below = wmask & (depth_v > -cfg.contact_slop)
    gd, gidx = jax.lax.top_k(jnp.where(below, depth_v, -BIG), G)
    g_hit = (gd > -cfg.contact_slop) & pvalid[:, None]
    g_pts = jnp.take_along_axis(wverts, gidx[..., None], axis=1)

    # --- assemble contact arrays: body A receives +n impulse, B (or ground)
    # receives -n. For ground contacts B = -1 (static).
    n_pair = pc_hit.shape[0]
    nrm = jnp.concatenate(
        [pc_n, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (Np * G, 3))]
    )
    pts = jnp.concatenate([pc_p, g_pts.reshape(-1, 3)])
    dep = jnp.concatenate([pc_d, jnp.maximum(gd.reshape(-1), 0.0)])
    hit = jnp.concatenate([pc_hit, g_hit.reshape(-1)])
    bA = jnp.concatenate([owner[flat_i], jnp.repeat(owner, G)])
    bB = jnp.concatenate([owner[flat_j], jnp.full((Np * G,), -1, jnp.int32)])
    bB_c = jnp.clip(bB, 0, B - 1)
    is_static = bB < 0

    # --- 4. solver (Jacobi projected impulses with mass splitting)
    inv_m = bodies.inv_mass
    inv_I = world_inv_inertia(bodies.q, bodies.inv_inertia_body)
    gravity = jnp.array([0.0, cfg.gravity, 0.0], wverts.dtype)

    v0 = bodies.v + dt * gravity * (inv_m > 0)[:, None]
    w0 = bodies.w

    rA = pts - bodies.x[bA]
    rB = pts - bodies.x[bB_c]
    # Effective masses.
    def k_term(inv_m_b, inv_I_b, r, n):
        rxn = jnp.cross(r, n)
        return inv_m_b + jnp.sum(rxn * matvec3(inv_I_b, rxn), -1)

    iA_m, iB_m = inv_m[bA], jnp.where(is_static, 0.0, inv_m[bB_c])
    iA_I = inv_I[bA]
    iB_I = jnp.where(is_static[:, None, None], 0.0, inv_I[bB_c])
    kn = k_term(iA_m, iA_I, rA, nrm) + k_term(iB_m, iB_I, rB, nrm)
    m_eff = jnp.where(hit & (kn > 1e-12), 1.0 / jnp.maximum(kn, 1e-12), 0.0)

    # Restitution uses the pre-solve approach velocity.
    def rel_vel(v, w):
        vA = v[bA] + jnp.cross(w[bA], rA)
        vB = jnp.where(
            is_static[:, None], 0.0, v[bB_c] + jnp.cross(w[bB_c], rB)
        )
        return vA - vB

    vn0 = jnp.sum(rel_vel(v0, w0) * nrm, axis=-1)
    bounce = -cfg.restitution * jnp.minimum(vn0 + 0.25, 0.0)
    bias = (cfg.baumgarte / dt) * jnp.maximum(dep - cfg.contact_slop, 0.0)
    target = jnp.maximum(bounce, bias)

    # Mass splitting: scale impulses by 1/(contacts per body).
    ones = hit.astype(wverts.dtype)
    cnt = (
        jnp.zeros((B + 1,), wverts.dtype).at[jnp.where(hit, bA, B)].add(ones)
        + jnp.zeros((B + 1,), wverts.dtype)
        .at[jnp.where(hit & ~is_static, bB_c, B)]
        .add(ones)
    )[:B]
    split = 1.0 / jnp.maximum(cnt, 1.0)

    mu = cfg.dynamic_friction

    def solver_iter(carry, _):
        v, w = carry
        vr = rel_vel(v, w)
        vn = jnp.sum(vr * nrm, axis=-1)
        lam_n = jnp.maximum(-(vn - target) * m_eff, 0.0)
        # Friction: oppose tangential velocity, clamped by μ λn.
        vt = vr - vn[:, None] * nrm
        vt_len = jnp.linalg.norm(vt, axis=-1)
        t_dir = vt / jnp.maximum(vt_len, 1e-9)[:, None]
        lam_t = jnp.minimum(vt_len * m_eff, mu * lam_n)
        imp = jnp.where(
            hit[:, None], lam_n[:, None] * nrm - lam_t[:, None] * t_dir, 0.0
        )
        sA = split[bA][:, None]
        sB = split[bB_c][:, None]
        dvA = imp * iA_m[:, None] * sA
        dvB = -imp * iB_m[:, None] * sB
        dwA = matvec3(iA_I, jnp.cross(rA, imp)) * sA
        dwB = -matvec3(iB_I, jnp.cross(rB, imp)) * sB
        v = v.at[bA].add(dvA).at[jnp.where(is_static, B, bB_c)].add(
            dvB, mode="drop"
        )
        w = w.at[bA].add(dwA).at[jnp.where(is_static, B, bB_c)].add(
            dwB, mode="drop"
        )
        return (v, w), None

    (v1, w1), _ = jax.lax.scan(
        solver_iter, (v0, w0), None, length=cfg.solver_iters
    )

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
    return PhysicsScene(
        bodies=new_bodies,
        piece_owner=scene.piece_owner,
        piece_valid=scene.piece_valid,
        piece_verts=scene.piece_verts,
        piece_vmask=scene.piece_vmask,
        piece_planes=scene.piece_planes,
        piece_pmask=scene.piece_pmask,
    )
