"""Banded-Morton fused contact solver: ALL Jacobi iterations in ONE Pallas
launch.

QUARANTINED EXPERIMENT — off by default (``PhysicsConfig.banded_solver``),
measured-out in round 3 (16.7 ms vs 10 at 10k: the in-kernel one-hot partner
reconstruction wastes 94% of the MXU tile and the input permute exceeds the
per-iteration gathers it saves — ROADMAP rejection 1). Kept, with its parity
test, as the starting point for the wide-output reconstruction / sorted-
native-narrowphase revival path; round 4's warm-start work went a different
route (accumulated PGS, see step.py) and did NOT revive this kernel.

The round-2 solver (``solver_pallas.py``) fused one iteration per kernel but
re-gathered partner velocities in XLA between launches — ~0.9 ms gather +
~0.9 ms launch per outer iteration at 10k bodies (the dispatch/gather floor
of this backend, see BASELINE.md measurement notes). This kernel removes both:

* Pieces are processed in **Morton-sorted order** (the broadphase already
  sorts them): every contact partner of sorted row *r* lies within
  ``±window`` rows, because candidates come from the Morton-window sweep
  itself. The partner index therefore compresses to a small rank *delta*.
* The full velocity state lives in a **VMEM scratch buffer that persists
  across a sequential (iterations × blocks) grid**. Partner velocities are
  reconstructed in-kernel from the scratch halo by a one-hot MXU matmul
  (exact selection — one-hot rows pick single values), so no XLA gather and
  no extra launch per iteration remain.
* Double-buffered scratch keeps **pure Jacobi semantics**: iteration *i*
  reads the end-of-iteration *i−1* state for partners, bitwise-matching the
  XLA solver's ``partner_vel`` refresh (step.py), so the existing
  Pallas/XLA parity tests carry over. ``gauss_seidel=True`` switches to a
  single buffer: later blocks see earlier blocks' updates within the same
  iteration (faster convergence, PhysX-style sweep; not bit-matched by the
  XLA path).

Replaces: the PhysX solver step behind /root/reference/Src/Surtr.cpp:330-331.
Single-piece-bodies layout only (piece row i ↔ body i), like solver_pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(
    vw0_ref,       # (NP, 8) full initial state [vx vy vz wx wy wz 0 0]
    delta_ref,     # (BN, Kp) i32 partner rank − own rank, |delta| ≤ W
    rA_ref,        # (BN, P3) [x | y | z] blocks of C slots
    rB_ref,        # (BN, P3)
    nrm_ref,       # (BN, P3)
    mt_ref,        # (BN, P2) [m_eff | target]
    hs_ref,        # (BN, P2) [hit | static] f32 0/1
    scale_ref,     # (BN, 8)  [iA_m*sA, sA, 0...]
    iAI_ref,       # (BN, 16) row-major 3x3 inverse inertia (padded)
    ovw_ref,       # (BN, 8) output
    scr,           # VMEM scratch (2, NP + 2W, 8)
    *, K: int, M: int, G: int, C: int, S: int, mu: float,
    W: int, BN: int, NP: int, OUTER: int, gs: bool,
):
    it = pl.program_id(0)
    b = pl.program_id(1)
    H = BN + 2 * W
    f32 = jnp.float32

    @pl.when((it == 0) & (b == 0))
    def _init():
        z = jnp.zeros((W, 8), f32)
        scr[0, pl.ds(W, NP), :] = vw0_ref[:]
        scr[0, pl.ds(0, W), :] = z
        scr[0, pl.ds(W + NP, W), :] = z
        scr[1, pl.ds(0, W), :] = z
        scr[1, pl.ds(W + NP, W), :] = z

    if gs:
        rd = 0
        wr = 0
    else:
        rd = jax.lax.rem(it, 2)
        wr = 1 - rd

    halo = scr[rd, pl.ds(b * BN, H), :]                  # (H, 8)
    vw = halo[W : W + BN, :]                             # own rows (static)
    v = [vw[:, 0:1], vw[:, 1:2], vw[:, 2:3]]
    w = [vw[:, 3:4], vw[:, 4:5], vw[:, 5:6]]

    # Partner velocities: one-hot selection matmuls against the halo.
    # Exact: each one-hot row picks exactly one halo value (HIGHEST keeps
    # the f32 mantissa through the MXU's pass decomposition).
    delta = delta_ref[:]
    hio = jax.lax.broadcasted_iota(jnp.int32, (BN, H), 1)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0)
    cols = [[] for _ in range(6)]
    for k in range(K):
        hidx = lrow + W + delta[:, k : k + 1]            # (BN, 1)
        oh = (hio == hidx).astype(f32)                   # (BN, H)
        pvk = jax.lax.dot_general(
            oh, halo, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )                                                # (BN, 8)
        for c in range(6):
            cols[c].append(pvk[:, c : c + 1])
    pv6 = [jnp.concatenate(cs, axis=1) for cs in cols]   # 6 × (BN, K)

    def slot3(ref):
        a = ref[:]
        return a[:, 0:C], a[:, C : 2 * C], a[:, 2 * C : 3 * C]

    rAx, rAy, rAz = slot3(rA_ref)
    rBx, rBy, rBz = slot3(rB_ref)
    nx, ny, nz = slot3(nrm_ref)
    mt = mt_ref[:]
    meff, targ = mt[:, 0:C], mt[:, C : 2 * C]
    hs = hs_ref[:]
    hit, stat = hs[:, 0:C], hs[:, C : 2 * C]

    KM = K * M

    def expand(pairs):                                   # (BN, K) → (BN, C)
        slots = pltpu.repeat(pairs, M, axis=1)           # tiled: slot = m·K+k
        pad = jnp.zeros((BN, C - KM), pairs.dtype)
        return jnp.concatenate([slots, pad], axis=1)

    pvx, pvy, pvz = expand(pv6[0]), expand(pv6[1]), expand(pv6[2])
    pwx, pwy, pwz = expand(pv6[3]), expand(pv6[4]), expand(pv6[5])

    live = 1.0 - stat
    vBx = live * (pvx + (pwy * rBz - pwz * rBy))
    vBy = live * (pvy + (pwz * rBx - pwx * rBz))
    vBz = live * (pvz + (pwx * rBy - pwy * rBx))

    sc = scale_ref[:]
    m_s = sc[:, 0:1]                                     # iA_m * split
    s_s = sc[:, 1:2]                                     # split
    II = iAI_ref[:]

    for _ in range(S):
        vAx = v[0] + (w[1] * rAz - w[2] * rAy)
        vAy = v[1] + (w[2] * rAx - w[0] * rAz)
        vAz = v[2] + (w[0] * rAy - w[1] * rAx)
        vrx, vry, vrz = vAx - vBx, vAy - vBy, vAz - vBz

        vn = vrx * nx + vry * ny + vrz * nz
        lam_n = jnp.maximum(-(vn - targ) * meff, 0.0)
        vtx = vrx - vn * nx
        vty = vry - vn * ny
        vtz = vrz - vn * nz
        vt_len = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz)
        inv_vt = 1.0 / jnp.maximum(vt_len, 1e-9)
        lam_t = jnp.minimum(vt_len * meff, mu * lam_n)
        ix = hit * (lam_n * nx - lam_t * vtx * inv_vt)
        iy = hit * (lam_n * ny - lam_t * vty * inv_vt)
        iz = hit * (lam_n * nz - lam_t * vtz * inv_vt)

        sx = jnp.sum(ix, axis=1, keepdims=True)
        sy = jnp.sum(iy, axis=1, keepdims=True)
        sz = jnp.sum(iz, axis=1, keepdims=True)
        tqx = jnp.sum(rAy * iz - rAz * iy, axis=1, keepdims=True)
        tqy = jnp.sum(rAz * ix - rAx * iz, axis=1, keepdims=True)
        tqz = jnp.sum(rAx * iy - rAy * ix, axis=1, keepdims=True)

        dwx = s_s * (II[:, 0:1] * tqx + II[:, 1:2] * tqy + II[:, 2:3] * tqz)
        dwy = s_s * (II[:, 3:4] * tqx + II[:, 4:5] * tqy + II[:, 5:6] * tqz)
        dwz = s_s * (II[:, 6:7] * tqx + II[:, 7:8] * tqy + II[:, 8:9] * tqz)
        v = [v[0] + m_s * sx, v[1] + m_s * sy, v[2] + m_s * sz]
        w = [w[0] + dwx, w[1] + dwy, w[2] + dwz]

    out = jnp.concatenate(
        v + w + [jnp.zeros_like(m_s), jnp.zeros_like(m_s)], axis=1
    )
    scr[wr, pl.ds(W + b * BN, BN), :] = out
    ovw_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "M", "G", "iters", "substeps", "mu", "window",
        "gauss_seidel", "interpret",
    ),
)
def solve_contacts_banded(
    v0, w0, delta, rA, rB, nrm, m_eff, target, hit, is_static,
    iA_m, sA, iA_I,
    K: int, M: int, G: int, iters: int, substeps: int, mu: float,
    window: int,
    gauss_seidel: bool = False,
    interpret: bool = False,
):
    """Run all solver iterations in one launch. Inputs are in MORTON-SORTED
    row order; ``delta[r, k]`` = partner's sorted rank − r, |delta| ≤ window
    (rows without a live pair slot are masked via ``hit``/``is_static``).

    v0/w0: (Np, 3); delta: (Np, K) i32; rA/rB/nrm: (Np, C, 3);
    m_eff/target/hit/is_static: (Np, C); iA_m/sA: (Np,); iA_I: (Np, 3, 3).
    Returns (v, w) in the same sorted order.
    """
    Np = v0.shape[0]
    C = K * M + G
    BN = 512
    W = window
    Np_pad = ((Np + BN - 1) // BN) * BN
    P3 = ((3 * C + 127) // 128) * 128
    P2 = ((2 * C + 127) // 128) * 128
    Kp = K  # lane-padded by Mosaic as needed

    padr = lambda a: jnp.pad(a, ((0, Np_pad - Np),) + ((0, 0),) * (a.ndim - 1))

    def pack3(a):
        out = jnp.concatenate([a[..., i] for i in range(3)], axis=1)
        return jnp.pad(out, ((0, Np_pad - Np), (0, P3 - 3 * C)))

    def pack2(a, b):
        out = jnp.concatenate([a, b], axis=1)
        return jnp.pad(out, ((0, Np_pad - Np), (0, P2 - 2 * C)))

    rA_p, rB_p, n_p = pack3(rA), pack3(rB), pack3(nrm)
    mt_p = pack2(m_eff, target)
    hs_p = pack2(hit.astype(jnp.float32), is_static.astype(jnp.float32))
    scale = padr(
        jnp.stack([iA_m * sA, sA] + [jnp.zeros_like(sA)] * 6, axis=1)
    )
    iAI_p = jnp.pad(iA_I.reshape(Np, 9), ((0, Np_pad - Np), (0, 7)))
    # Clip deltas defensively (padded rows read apron zeros, masked anyway).
    d_p = padr(jnp.clip(delta, -W, W).astype(jnp.int32))

    S = max(1, substeps)
    outer = max(1, (iters + S - 1) // S)
    nblk = Np_pad // BN
    vw0 = jnp.pad(
        jnp.concatenate([v0, w0], axis=1), ((0, Np_pad - Np), (0, 2))
    )

    kernel = functools.partial(
        _banded_kernel,
        K=K, M=M, G=G, C=C, S=S, mu=mu,
        W=W, BN=BN, NP=Np_pad, OUTER=outer, gs=gauss_seidel,
    )
    bs = lambda cols: pl.BlockSpec(
        (BN, cols), lambda it, b: (b, 0), memory_space=pltpu.VMEM
    )
    vw = pl.pallas_call(
        kernel,
        grid=(outer, nblk),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec(
                (Np_pad, 8), lambda it, b: (0, 0), memory_space=pltpu.VMEM
            ),
            bs(Kp), bs(P3), bs(P3), bs(P3), bs(P2), bs(P2), bs(8), bs(16),
        ],
        out_specs=bs(8),
        out_shape=jax.ShapeDtypeStruct((Np_pad, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, Np_pad + 2 * W, 8), jnp.float32)],
        interpret=interpret,
    )(vw0, d_p, rA_p, rB_p, n_p, mt_p, hs_p, scale, iAI_p)
    return vw[:Np, 0:3], vw[:Np, 3:6]
