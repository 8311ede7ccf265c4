"""Pallas TPU fused contact-prep kernel.

Contact prep (physics/step.py stage 3c-4 setup — slot assembly, partner
state tiling, effective-mass ``k`` terms, restitution/Baumgarte targets,
mass splitting, and the solver's lane packing) costs ~60 small XLA ops
over (Np, C, ·) tensors; on this backend per-op overhead (~50-100 µs)
dominates and the stage measured ~6.5 ms at 10k bodies. This kernel fuses
all of it into one VPU pass per Np-block and writes the solver's packed
lane layouts directly, so the (Np, C, 3, 3) partner-inertia tile and the
rest of the prep intermediates never exist in HBM.

What stays in XLA: the per-pair packed body-table gather (dynamic gathers
do not vectorize in Mosaic), the ground-contact top_k, and the planar
slot concatenations feeding the kernel.

Single-piece-bodies layout only (piece row i ↔ body i), matching
solver_pallas. The reference equivalent is PhysX's contact-prep phase
inside ``simulate`` (/root/reference/Src/Surtr.cpp:330-331, black box).

Lane layouts (C = K·M + G contact slots, slot = m·K + k then G ground):
  pt3  (Np, 3C)  [px | py | pz] contact points
  dh   (Np, 2C)  [depth | hit]
  pn3  (Np, 3K)  per-PAIR contact normals (tiled over M in-kernel;
                 ground lanes get the +y normal in-kernel)
  btf  (Np, 20K) per-pair partner body fields, field-major:
                 [xB(3) | inv_m | inv_I(9) | v0(3) | w0(3) | static]
  own  (Np, 19)  own-body [x(3) | v0(3) | w0(3) | inv_m | inv_I(9)]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surtr_tpu.physics.solver_pallas import solve_packed


def _prep_kernel(
    pt_ref,       # (BN, 3C)
    dh_ref,       # (BN, 2C)
    pn_ref,       # (BN, 3K)
    btf_ref,      # (BN, 20K)
    own_ref,      # (BN, 19)
    rA_ref,       # (BN, P3) out
    rB_ref,       # (BN, P3) out
    n_ref,        # (BN, P3) out
    mt_ref,       # (BN, P2) out [m_eff | target]
    hs_ref,       # (BN, P2) out [hit | static]
    sc_ref,       # (BN, 8)  out [inv_m*split, split, 0...]
    iAI_ref,      # (BN, 16) out
    vn0_ref,      # (BN, C)  out (restitution reference, for sleep/wake)
    *, K: int, M: int, G: int, C: int, P3: int, P2: int,
    dt: float, slop: float, baumgarte: float,
    restitution: float, bounce_thr: float,
):
    BN = pt_ref.shape[0]
    KM = K * M
    f32 = jnp.float32

    pt = pt_ref[:]
    ptx, pty, ptz = pt[:, 0:C], pt[:, C : 2 * C], pt[:, 2 * C : 3 * C]
    dh = dh_ref[:]
    dep, hit = dh[:, 0:C], dh[:, C : 2 * C]

    def expand(block):  # (BN, K) → (BN, C): tile over M, zero ground lanes
        t = pltpu.repeat(block, M, axis=1)              # slot = m·K + k
        if G:
            t = jnp.concatenate(
                [t, jnp.zeros((BN, G), block.dtype)], axis=1
            )
        return t

    pn = pn_ref[:]
    pnx = expand(pn[:, 0:K])
    pny = expand(pn[:, K : 2 * K])
    pnz = expand(pn[:, 2 * K : 3 * K])
    lane = jax.lax.broadcasted_iota(jnp.int32, (BN, C), 1)
    ground = jnp.where(lane >= KM, f32(1.0), f32(0.0))
    nx, ny, nz = pnx, pny + ground, pnz                 # ground normal = +y

    btf = btf_ref[:]
    bf = lambda i: expand(btf[:, i * K : (i + 1) * K])
    xBx, xBy, xBz = bf(0), bf(1), bf(2)
    iBm = bf(3)
    iB = [bf(4 + j) for j in range(9)]
    vB0x, vB0y, vB0z = bf(13), bf(14), bf(15)
    wB0x, wB0y, wB0z = bf(16), bf(17), bf(18)
    stat = jnp.minimum(bf(19) + ground, 1.0)
    live = 1.0 - stat

    own = own_ref[:]
    ox, oy, oz = own[:, 0:1], own[:, 1:2], own[:, 2:3]
    v0x, v0y, v0z = own[:, 3:4], own[:, 4:5], own[:, 5:6]
    w0x, w0y, w0z = own[:, 6:7], own[:, 7:8], own[:, 8:9]
    invm = own[:, 9:10]
    II = [own[:, 10 + j : 11 + j] for j in range(9)]

    rAx, rAy, rAz = ptx - ox, pty - oy, ptz - oz
    rBx, rBy, rBz = ptx - xBx, pty - xBy, ptz - xBz

    # k_term(A): inv_m + (rA×n)·I⁻¹(rA×n), own inertia broadcast (BN,1).
    cAx = rAy * nz - rAz * ny
    cAy = rAz * nx - rAx * nz
    cAz = rAx * ny - rAy * nx
    tAx = II[0] * cAx + II[1] * cAy + II[2] * cAz
    tAy = II[3] * cAx + II[4] * cAy + II[5] * cAz
    tAz = II[6] * cAx + II[7] * cAy + II[8] * cAz
    kA = invm + cAx * tAx + cAy * tAy + cAz * tAz
    cBx = rBy * nz - rBz * ny
    cBy = rBz * nx - rBx * nz
    cBz = rBx * ny - rBy * nx
    tBx = iB[0] * cBx + iB[1] * cBy + iB[2] * cBz
    tBy = iB[3] * cBx + iB[4] * cBy + iB[5] * cBz
    tBz = iB[6] * cBx + iB[7] * cBy + iB[8] * cBz
    kB = live * (iBm + cBx * tBx + cBy * tBy + cBz * tBz)
    kn = kA + kB
    meff = jnp.where(
        (hit > 0.5) & (kn > 1e-12), 1.0 / jnp.maximum(kn, 1e-12), 0.0
    )

    # Restitution reference velocity vn0 = (vA0 − vB0)·n.
    vAx = v0x + (w0y * rAz - w0z * rAy)
    vAy = v0y + (w0z * rAx - w0x * rAz)
    vAz = v0z + (w0x * rAy - w0y * rAx)
    vBx = live * (vB0x + (wB0y * rBz - wB0z * rBy))
    vBy = live * (vB0y + (wB0z * rBx - wB0x * rBz))
    vBz = live * (vB0z + (wB0x * rBy - wB0y * rBx))
    vn0 = (vAx - vBx) * nx + (vAy - vBy) * ny + (vAz - vBz) * nz
    bounce = -restitution * jnp.minimum(vn0 + bounce_thr, 0.0)
    bias = (baumgarte / dt) * jnp.maximum(jnp.maximum(dep, 0.0) - slop, 0.0)
    # Zero the bias against SLEEPING partners (ground lanes keep full
    # bias): a partner going static doubles this body's share of the
    # velocity-level bias (~0.19 m/s at resting depth) — a sustained
    # energy injection that jolted slow neighbors back over the sleep
    # threshold and made island sleeping thrash forever. Non-penetration
    # impulses still hold the contact; the residual resting overlap
    # resolves when the island wakes.
    sleeper = stat * (1.0 - ground)
    bias = bias * (1.0 - sleeper)
    targ = jnp.maximum(bounce, bias)

    # Mass splitting: per-row contact count.
    cnt = jnp.sum(hit, axis=1, keepdims=True)
    split = 1.0 / jnp.maximum(cnt, 1.0)

    z3 = jnp.zeros((BN, P3 - 3 * C), f32)
    z2 = jnp.zeros((BN, P2 - 2 * C), f32)
    rA_ref[:] = jnp.concatenate([rAx, rAy, rAz, z3], axis=1)
    rB_ref[:] = jnp.concatenate([rBx, rBy, rBz, z3], axis=1)
    n_ref[:] = jnp.concatenate([nx, ny, nz, z3], axis=1)
    mt_ref[:] = jnp.concatenate([meff, targ, z2], axis=1)
    hs_ref[:] = jnp.concatenate([hit, stat, z2], axis=1)
    z1 = jnp.zeros((BN, 1), f32)
    sc_ref[:] = jnp.concatenate(
        [invm * split, split, z1, z1, z1, z1, z1, z1], axis=1
    )
    iAI_ref[:] = jnp.concatenate(
        II + [z1] * 7, axis=1
    )
    vn0_ref[:] = vn0


def prep_contacts_pallas(
    pt3, dh, pn3, btf, own,
    *, K: int, M: int, G: int, dt: float, slop: float, baumgarte: float,
    restitution: float, bounce_thr: float, interpret: bool = False,
    BN: int = 512,
):
    """Run the fused prep kernel. Inputs per the module docstring, rows
    unpadded (Np). Returns the solver's packed tables (rows padded to a
    BN multiple) plus vn0 (Np, C)."""
    Np = pt3.shape[0]
    C = K * M + G
    Np_pad = ((Np + BN - 1) // BN) * BN
    P3 = ((3 * C + 127) // 128) * 128
    P2 = ((2 * C + 127) // 128) * 128

    padr = lambda a: jnp.pad(a, ((0, Np_pad - Np), (0, 0)))
    grid = (Np_pad // BN,)
    bs = lambda cols: pl.BlockSpec(
        (BN, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _prep_kernel, K=K, M=M, G=G, C=C, P3=P3, P2=P2,
        dt=dt, slop=slop, baumgarte=baumgarte,
        restitution=restitution, bounce_thr=bounce_thr,
    )
    sd = lambda cols: jax.ShapeDtypeStruct((Np_pad, cols), jnp.float32)
    rA_p, rB_p, n_p, mt_p, hs_p, scale, iAI_p, vn0_p = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[bs(3 * C), bs(2 * C), bs(3 * K), bs(20 * K), bs(19)],
        out_specs=[bs(P3), bs(P3), bs(P3), bs(P2), bs(P2), bs(8), bs(16),
                   bs(C)],
        out_shape=[sd(P3), sd(P3), sd(P3), sd(P2), sd(P2), sd(8), sd(16),
                   sd(C)],
        interpret=interpret,
    )(padr(pt3), padr(dh), padr(pn3), padr(btf), padr(own))
    return rA_p, rB_p, n_p, mt_p, hs_p, scale, iAI_p, vn0_p[:Np]


def prep_and_solve(
    pt3, dh, pn3, btf, own, pair_body, v0, w0, wake0=None, lam0=None,
    *, K: int, M: int, G: int, iters: int, substeps: int, mu: float,
    dt: float, slop: float, baumgarte: float, restitution: float,
    bounce_thr: float, interpret: bool = False,
):
    """Fused prep kernel + packed solver iterations.

    Returns (v1, w1, wake, lam, vn0, hit, is_static) with the (Np, C)
    tables the sleep/wake bookkeeping needs; ``wake`` is the optional (Np,)
    island-wake seed spread one contact hop per outer solver iteration;
    ``lam0``/``lam`` are the warm-start accumulated normal impulses (the
    solver runs in accumulated-PGS mode when lam0 is given, and the WARM
    impulse itself is pre-applied here from the packed tables)."""
    Np = pt3.shape[0]
    C = K * M + G
    BN = 512
    Np_pad = ((Np + BN - 1) // BN) * BN

    rA_p, rB_p, n_p, mt_p, hs_p, scale, iAI_p, vn0 = prep_contacts_pallas(
        pt3, dh, pn3, btf, own,
        K=K, M=M, G=G, dt=dt, slop=slop, baumgarte=baumgarte,
        restitution=restitution, bounce_thr=bounce_thr,
        interpret=interpret, BN=BN,
    )
    if wake0 is None:
        wake0 = jnp.zeros((Np,), jnp.float32)
    hit = hs_p[:Np, 0:C] > 0.5
    if lam0 is not None:
        # Pre-apply the matched warm impulse λn·n̂ + λu·û + λv·v̂ with the
        # SAME scales and tangent basis the kernel iterations use (mass
        # split included), so iteration 0 starts from the warm state and
        # the accumulated clamps can relax any over-application.
        from surtr_tpu.physics.solver_pallas import tangent_basis

        lam0 = lam0 * hit[..., None]
        nx = n_p[:Np, 0:C]
        ny = n_p[:Np, C : 2 * C]
        nz = n_p[:Np, 2 * C : 3 * C]
        (ux, uy, uz), (vx_, vy_, vz_) = tangent_basis(nx, ny, nz)
        ln, lu, lv = lam0[..., 0], lam0[..., 1], lam0[..., 2]
        ix = ln * nx + lu * ux + lv * vx_
        iy = ln * ny + lu * uy + lv * vy_
        iz = ln * nz + lu * uz + lv * vz_
        rAx = rA_p[:Np, 0:C]
        rAy = rA_p[:Np, C : 2 * C]
        rAz = rA_p[:Np, 2 * C : 3 * C]
        m_s = scale[:Np, 0:1]
        s_s = scale[:Np, 1:2]
        II = iAI_p[:Np]
        v0 = v0 + m_s * jnp.stack(
            [jnp.sum(ix, 1), jnp.sum(iy, 1), jnp.sum(iz, 1)], axis=1
        )
        tqx = jnp.sum(rAy * iz - rAz * iy, 1, keepdims=True)
        tqy = jnp.sum(rAz * ix - rAx * iz, 1, keepdims=True)
        tqz = jnp.sum(rAx * iy - rAy * ix, 1, keepdims=True)
        w0 = w0 + s_s * jnp.concatenate(
            [
                II[:, 0:1] * tqx + II[:, 1:2] * tqy + II[:, 2:3] * tqz,
                II[:, 3:4] * tqx + II[:, 4:5] * tqy + II[:, 5:6] * tqz,
                II[:, 6:7] * tqx + II[:, 7:8] * tqy + II[:, 8:9] * tqz,
            ],
            axis=1,
        )
    vw0 = jnp.pad(
        jnp.concatenate(
            [v0, w0, wake0.astype(jnp.float32)[:, None],
             jnp.zeros((Np, 1), jnp.float32)],
            axis=1,
        ),
        ((0, Np_pad - Np), (0, 0)),
    )
    pb = jnp.clip(pair_body, 0, Np - 1)
    v1, w1, wake, lam = solve_packed(
        vw0, pb, rA_p, rB_p, n_p, mt_p, hs_p, scale, iAI_p,
        K=K, M=M, G=G, iters=iters, substeps=substeps, mu=mu,
        Np=Np, interpret=interpret, BN=BN, lam0=lam0,
    )
    stat = hs_p[:Np, C : 2 * C] > 0.5
    return v1, w1, wake, lam, vn0, hit, stat
