"""Pallas TPU fused SAT narrowphase + containment manifolds.

Replaces physics/step.py stages 3a/3b on TPU. The XLA version materializes
(Np, K, Vh, F) signed-distance and support tensors in HBM (~330 MB each at
10k pieces — the measured ~6.6 ms of the physics step is mostly this
traffic); this kernel keeps every per-pair tensor in VMEM, streaming only
the packed per-piece tables in and the (Np, K·{normal, depth, manifold})
contact slots out.

Semantics are identical to the XLA path (same axis families — 26-DOP
intervals, faces of both hulls, edge×edge crosses — same deepest-first
M-point containment manifold with the support-point fallback, same
first-of-ties selection), so the physics tests cover both backends via
``force_pallas_narrowphase``.

Packed planar per-piece layout (built by ``pack_layout``/step.py):
  nine 128-lane-ALIGNED fields [wvx, wvy, wvz, wmask, pnx, pny, pnz, pd,
  pmask] — every field that feeds a (BN, ·, ·) broadcast must start at a
  lane offset ≡ 0 mod 128, because Mosaic cannot reshape a lane-offset
  vector to 3D ("Unsupported reshape ... vpad {0,110}") — followed by the
  tight 2D-only tail [lo_dop (13), hi_dop (13), ex|ey|ez (Ne), emask (Ne)],
  padded to a 128-multiple D so every k-major partner row realigns. The
  partner table is the K-major concatenation of gathered rows (one packed
  XLA gather, as before).

Reference: the PhysX narrowphase black box behind
/root/reference/Src/Surtr.cpp:330-331 (SURVEY §7 hard-part 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38

_DOP = np.asarray(
    [
        (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (1, 1, 0), (1, -1, 0), (1, 0, 1), (1, 0, -1), (0, 1, 1), (0, 1, -1),
        (1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1),
    ],
    np.float64,
)
_DOP /= np.linalg.norm(_DOP, axis=1, keepdims=True)


def pack_layout(Vh: int, F: int, Ne: int):
    """(offsets dict, D) for the aligned packed layout (see module doc)."""
    assert Vh <= 128 and F <= 128, "aligned layout assumes 128-lane fields"
    offs = {}
    o = 0
    for name, n in (
        ("wvx", Vh), ("wvy", Vh), ("wvz", Vh), ("wm", Vh),
        ("pnx", F), ("pny", F), ("pnz", F), ("pd", F), ("pm", F),
    ):
        offs[name] = (o, n)
        o += 128
    for name, n in (
        ("lod", 13), ("hid", 13),
        ("ex", Ne), ("ey", Ne), ("ez", Ne), ("em", Ne),
    ):
        offs[name] = (o, n)
        o += n
    D = ((o + 127) // 128) * 128
    return offs, D


def pack_pieces(parts: dict, Vh: int, F: int, Ne: int):
    """Assemble the aligned (Np, D) table from named per-piece arrays."""
    import jax.numpy as jnp

    offs, D = pack_layout(Vh, F, Ne)
    Np = parts["wvx"].shape[0]
    cols = []
    o = 0
    for name in ("wvx", "wvy", "wvz", "wm", "pnx", "pny", "pnz", "pd", "pm",
                 "lod", "hid", "ex", "ey", "ez", "em"):
        if name not in parts:
            continue
        start, n = offs[name]
        if start > o:
            cols.append(jnp.zeros((Np, start - o), parts[name].dtype))
        cols.append(parts[name])
        o = start + n
    if D > o:
        cols.append(jnp.zeros((Np, D - o), cols[-1].dtype))
    return jnp.concatenate(cols, axis=1)


def _cumsum_lanes(x):
    """Inclusive cumsum along the lane (last) axis via log-step adds."""
    n = x.shape[-1]
    k = 1
    while k < n:
        pad = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
        x = x + jnp.concatenate([pad, x[..., : n - k]], axis=-1)
        k *= 2
    return x


def _first_true(mask):
    """Keep only the first True per row (int32 cumsum — stable ties)."""
    return mask & (_cumsum_lanes(mask.astype(jnp.int32)) == 1)


def _narrow_kernel(
    pi_ref,     # (BN, Dp) own packed row
    pj_ref,     # (BN, K*D padded) partner packed rows, k-major
    pok_ref,    # (BN, Kp) f32 pair-candidate ok
    on_ref,     # (BN, 3Kp) out: contact normal [x(K) | y(K) | z(K)], j→i
    odep_ref,   # (BN, Kp) out: SAT depth
    ohit_ref,   # (BN, Kp) out: pair hit f32
    omp_ref,    # (BN, 3MKp) out: manifold points [x(MK) | y(MK) | z(MK)],
                #   tiled slot order (slot = m·K + k)
    omv_ref,    # (BN, MKp) out: manifold depths
    omh_ref,    # (BN, MKp) out: manifold hit f32
    *, Vh: int, F: int, Ne: int, K: int, M: int, D: int, slop: float,
):
    f32 = jnp.float32
    BN = pi_ref.shape[0]
    big = jnp.asarray(BIG, f32)

    offs, _ = pack_layout(Vh, F, Ne)

    def unpack(row_ref, base):
        def take(name):
            o, n = offs[name]
            return row_ref[:, base + o : base + o + n]

        wv = [take("wvx"), take("wvy"), take("wvz")]
        wm = take("wm")
        pn = [take("pnx"), take("pny"), take("pnz")]
        pd = take("pd")
        pm = take("pm")
        lod = take("lod")
        hid = take("hid")
        ed = [take("ex"), take("ey"), take("ez")] if Ne else None
        em = take("em") if Ne else None
        return wv, wm, pn, pd, pm, lod, hid, ed, em

    ivx_, ivm, ipn, ipd, ipm, ilo, ihi, ied, iem = unpack(pi_ref, 0)
    pok = pok_ref[:]

    nK, dK, hK = [], [], []
    mvK = [[None] * K for _ in range(M)]
    mpK = [[[None] * K for _ in range(M)] for _ in range(3)]
    mhK = [[None] * K for _ in range(M)]

    ivm3 = ivm[:, :, None]                            # (BN, Vh, 1) f32 0/1

    for k in range(K):
        jvx_, jvm, jpn, jpd, jpm, jlo, jhi, jed, jem = unpack(pj_ref, k * D)
        ok = pok[:, k : k + 1]                         # (BN, 1)
        jvm3 = jvm[:, :, None]

        # --- (1) 26-DOP interval axes (directions are constants).
        ov_dop = jnp.minimum(ihi, jhi) - jnp.maximum(ilo, jlo)   # (BN, 13)
        flip = (ihi + ilo) < (jhi + jlo)                         # (BN, 13)
        sgn = jnp.where(flip, -1.0, 1.0)
        # Directions as Python scalars (Pallas kernels cannot capture
        # constant arrays).
        dopx = jnp.concatenate(
            [sgn[:, a : a + 1] * float(_DOP[a, 0]) for a in range(13)], 1
        )
        dopy = jnp.concatenate(
            [sgn[:, a : a + 1] * float(_DOP[a, 1]) for a in range(13)], 1
        )
        dopz = jnp.concatenate(
            [sgn[:, a : a + 1] * float(_DOP[a, 2]) for a in range(13)], 1
        )

        # --- (2) i-verts vs j-planes. dist_ij: (BN, Vh, F)
        dist_ij = (
            ivx_[0][:, :, None] * jpn[0][:, None, :]
            + ivx_[1][:, :, None] * jpn[1][:, None, :]
            + ivx_[2][:, :, None] * jpn[2][:, None, :]
            + jpd[:, None, :]
        )
        pen_fj = -jnp.min(
            dist_ij * ivm3 + (1.0 - ivm3) * big, axis=1
        )                                                         # (BN, F)

        # --- (3) j-verts vs i-planes.
        dist_ji = (
            jvx_[0][:, :, None] * ipn[0][:, None, :]
            + jvx_[1][:, :, None] * ipn[1][:, None, :]
            + jvx_[2][:, :, None] * ipn[2][:, None, :]
            + ipd[:, None, :]
        )
        pen_fi = -jnp.min(
            dist_ji * jvm3 + (1.0 - jvm3) * big, axis=1
        )                                                         # (BN, F)

        pens = [ov_dop, pen_fj, pen_fi]
        msks = [jnp.ones((BN, 13), f32), jpm, ipm]
        dirx = [dopx, jpn[0], -ipn[0]]
        diry = [dopy, jpn[1], -ipn[1]]
        dirz = [dopz, jpn[2], -ipn[2]]

        # --- (4) edge×edge cross axes (Ne² lanes).
        if Ne:
            exs, eys, ezs, pens_e, mask_e = [], [], [], [], []
            for a in range(Ne):
                for b in range(Ne):
                    cx = ied[1][:, a : a + 1] * jed[2][:, b : b + 1] \
                        - ied[2][:, a : a + 1] * jed[1][:, b : b + 1]
                    cy = ied[2][:, a : a + 1] * jed[0][:, b : b + 1] \
                        - ied[0][:, a : a + 1] * jed[2][:, b : b + 1]
                    cz = ied[0][:, a : a + 1] * jed[1][:, b : b + 1] \
                        - ied[1][:, a : a + 1] * jed[0][:, b : b + 1]
                    nrm2 = cx * cx + cy * cy + cz * cz
                    nl = jnp.sqrt(nrm2)
                    inv = 1.0 / jnp.maximum(nl, 1e-30)
                    cx, cy, cz = cx * inv, cy * inv, cz * inv
                    emk = (
                        iem[:, a : a + 1]
                        * jem[:, b : b + 1]
                        * (nl > 1e-6).astype(f32)
                    )
                    ti = (
                        ivx_[0] * cx + ivx_[1] * cy + ivx_[2] * cz
                    )                                             # (BN, Vh)
                    tj = jvx_[0] * cx + jvx_[1] * cy + jvx_[2] * cz
                    im = ivm > 0.5
                    jm = jvm > 0.5
                    ilo_e = jnp.min(jnp.where(im, ti, big), 1, keepdims=True)
                    ihi_e = jnp.max(jnp.where(im, ti, -big), 1, keepdims=True)
                    jlo_e = jnp.min(jnp.where(jm, tj, big), 1, keepdims=True)
                    jhi_e = jnp.max(jnp.where(jm, tj, -big), 1, keepdims=True)
                    ov_e = jnp.minimum(ihi_e, jhi_e) - jnp.maximum(
                        ilo_e, jlo_e
                    )
                    flip_e = (ihi_e + ilo_e) < (jhi_e + jlo_e)
                    se = jnp.where(flip_e, -1.0, 1.0)
                    exs.append(cx * se)
                    eys.append(cy * se)
                    ezs.append(cz * se)
                    pens_e.append(ov_e)
                    mask_e.append(emk)
            pens.append(jnp.concatenate(pens_e, axis=1))
            msks.append(jnp.concatenate(mask_e, axis=1))
            dirx.append(jnp.concatenate(exs, axis=1))
            diry.append(jnp.concatenate(eys, axis=1))
            dirz.append(jnp.concatenate(ezs, axis=1))

        pen_all = jnp.concatenate(pens, axis=1)                   # (BN, A)
        msk_all = jnp.concatenate(msks, axis=1)
        dx_all = jnp.concatenate(dirx, axis=1)
        dy_all = jnp.concatenate(diry, axis=1)
        dz_all = jnp.concatenate(dirz, axis=1)
        pen_all = pen_all * msk_all + (1.0 - msk_all) * big
        depth = jnp.min(pen_all, axis=1, keepdims=True)           # (BN, 1)
        sel = _first_true(pen_all == depth).astype(f32)
        nx = jnp.sum(sel * dx_all, axis=1, keepdims=True)
        ny = jnp.sum(sel * dy_all, axis=1, keepdims=True)
        nz = jnp.sum(sel * dz_all, axis=1, keepdims=True)
        hit = (
            (ok > 0.5) & (depth > -slop) & (depth < big / 2)
        )                                                         # (BN, 1)

        # --- containment manifold (deepest-first, first-of-ties).
        si_n = ivx_[0] * nx + ivx_[1] * ny + ivx_[2] * nz         # (BN, Vh)
        sj_n = jvx_[0] * nx + jvx_[1] * ny + jvx_[2] * nz
        im = ivm > 0.5
        jm = jvm > 0.5
        si_min = jnp.min(jnp.where(im, si_n, big), 1, keepdims=True)
        sj_max = jnp.max(jnp.where(jm, sj_n, -big), 1, keepdims=True)
        jpm3 = jpm[:, None, :]
        ipm3 = ipm[:, None, :]
        inside_j = (
            jnp.max(dist_ij * jpm3 - (1.0 - jpm3) * big, axis=2) <= slop
        )                                                         # (BN, Vh)
        inside_i = (
            jnp.max(dist_ji * ipm3 - (1.0 - ipm3) * big, axis=2) <= slop
        )
        depth_iv = sj_max - si_n                                  # (BN, Vh)
        depth_jv = sj_n - si_min
        score_i = jnp.where(inside_j & im, depth_iv, -big)
        score_j = jnp.where(inside_i & jm, depth_jv, -big)
        sc = jnp.concatenate([score_i, score_j], axis=1)          # (BN, 2Vh)
        ptx_i = ivx_[0] + nx * (depth_iv * 0.5)
        pty_i = ivx_[1] + ny * (depth_iv * 0.5)
        ptz_i = ivx_[2] + nz * (depth_iv * 0.5)
        ptx_j = jvx_[0] - nx * (depth_jv * 0.5)
        pty_j = jvx_[1] - ny * (depth_jv * 0.5)
        ptz_j = jvx_[2] - nz * (depth_jv * 0.5)

        any_m = jnp.zeros((BN, 1), bool)
        for m in range(M):
            mx = jnp.max(sc, axis=1, keepdims=True)
            best = _first_true(sc >= mx).astype(f32)
            bi, bj = best[:, :Vh], best[:, Vh:]
            mval = jnp.sum(best * sc, axis=1, keepdims=True)
            px = jnp.sum(bi * ptx_i + bj * ptx_j, axis=1, keepdims=True)
            py = jnp.sum(bi * pty_i + bj * pty_j, axis=1, keepdims=True)
            pz = jnp.sum(bi * ptz_i + bj * ptz_j, axis=1, keepdims=True)
            mh = hit & (mval > -slop) & (mval < big / 2)
            mvK[m][k] = mval
            mpK[0][m][k] = px
            mpK[1][m][k] = py
            mpK[2][m][k] = pz
            mhK[m][k] = mh
            any_m = any_m | mh
            sc = jnp.where(best > 0.5, -big, sc)

        # Fallback: deepest support points (edge-edge crossings contain no
        # vertex of either hull).
        none = hit & ~any_m
        fi = _first_true(
            ((-si_n) >= jnp.max(
                jnp.where(im, -si_n, -big), 1, keepdims=True
            ))
            & im
        ).astype(f32)
        fj = _first_true(
            (sj_n >= jnp.max(
                jnp.where(jm, sj_n, -big), 1, keepdims=True
            ))
            & jm
        ).astype(f32)
        fx = 0.5 * (
            jnp.sum(fi * ivx_[0], 1, keepdims=True)
            + jnp.sum(fj * jvx_[0], 1, keepdims=True)
        )
        fy = 0.5 * (
            jnp.sum(fi * ivx_[1], 1, keepdims=True)
            + jnp.sum(fj * jvx_[1], 1, keepdims=True)
        )
        fz = 0.5 * (
            jnp.sum(fi * ivx_[2], 1, keepdims=True)
            + jnp.sum(fj * jvx_[2], 1, keepdims=True)
        )
        mpK[0][0][k] = jnp.where(none, fx, mpK[0][0][k])
        mpK[1][0][k] = jnp.where(none, fy, mpK[1][0][k])
        mpK[2][0][k] = jnp.where(none, fz, mpK[2][0][k])
        mvK[0][k] = jnp.where(none, depth, mvK[0][k])
        mhK[0][k] = mhK[0][k] | none

        nK.append((nx, ny, nz))
        dK.append(depth)
        hK.append(hit)

    def padcat(cols, width):
        out = jnp.concatenate(cols, axis=1)
        pad = width - out.shape[1]
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((BN, pad), f32)], axis=1
            )
        return out

    Kp = on_ref.shape[1] // 3
    MKp = omv_ref.shape[1]
    on_ref[:] = jnp.concatenate(
        [
            padcat([nK[k][0] for k in range(K)], Kp),
            padcat([nK[k][1] for k in range(K)], Kp),
            padcat([nK[k][2] for k in range(K)], Kp),
        ],
        axis=1,
    )
    odep_ref[:] = padcat(dK, Kp)
    ohit_ref[:] = padcat([h.astype(f32) for h in hK], Kp)
    tiled_v = [mvK[m][k] for m in range(M) for k in range(K)]
    tiled_h = [
        mhK[m][k].astype(f32) for m in range(M) for k in range(K)
    ]
    omv_ref[:] = padcat(tiled_v, MKp)
    omh_ref[:] = padcat(tiled_h, MKp)
    MK3p = omp_ref.shape[1] // 3
    omp_ref[:] = jnp.concatenate(
        [
            padcat([mpK[c][m][k] for m in range(M) for k in range(K)], MK3p)
            for c in range(3)
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("Vh", "F", "Ne", "K", "M", "slop", "interpret"),
)
def narrowphase_pairs_pallas(
    packed, pj_flat, pok,
    Vh: int, F: int, Ne: int, K: int, M: int, slop: float,
    interpret: bool = False,
):
    """packed: (Np, D) planar per-piece tables; pj_flat: (Np, K·D) gathered
    partner rows (k-major); pok: (Np, K) candidate mask.

    Returns (pc_n (Np, K, 3) j→i normals, depth (Np, K), pair_hit (Np, K),
    mpts (Np, K·M, 3) tiled slot order, mvals (Np, K·M), mhit (Np, K·M)).
    """
    Np, D = packed.shape
    BN = 256
    Np_pad = ((Np + BN - 1) // BN) * BN
    MK = M * K
    Kp = ((K + 127) // 128) * 128
    MKp = ((MK + 127) // 128) * 128
    Dp = ((D + 127) // 128) * 128
    KDp = ((K * D + 127) // 128) * 128

    padr = lambda a, w: jnp.pad(
        a, ((0, Np_pad - Np), (0, w - a.shape[1]))
    )
    pi_p = padr(packed, Dp)
    pj_p = padr(pj_flat, KDp)
    pok_p = padr(pok.astype(jnp.float32), Kp)

    grid = (Np_pad // BN,)
    bs = lambda cols: pl.BlockSpec(
        (BN, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _narrow_kernel, Vh=Vh, F=F, Ne=Ne, K=K, M=M, D=D, slop=slop
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[bs(Dp), bs(KDp), bs(Kp)],
        out_specs=(
            bs(3 * Kp), bs(Kp), bs(Kp), bs(3 * MKp), bs(MKp), bs(MKp)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np_pad, 3 * Kp), jnp.float32),
            jax.ShapeDtypeStruct((Np_pad, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Np_pad, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Np_pad, 3 * MKp), jnp.float32),
            jax.ShapeDtypeStruct((Np_pad, MKp), jnp.float32),
            jax.ShapeDtypeStruct((Np_pad, MKp), jnp.float32),
        ),
        interpret=interpret,
    )(pi_p, pj_p, pok_p)
    on, odep, ohit, omp, omv, omh = outs
    pc_n = jnp.stack(
        [on[:Np, c * Kp : c * Kp + K] for c in range(3)], axis=-1
    )                                                  # (Np, K, 3)
    depth = odep[:Np, :K]
    pair_hit = ohit[:Np, :K] > 0.5
    mpts = jnp.stack(
        [omp[:Np, c * MKp : c * MKp + MK] for c in range(3)], axis=-1
    )                                                  # (Np, MK, 3)
    mvals = omv[:Np, :MK]
    mhit = omh[:Np, :MK] > 0.5
    return pc_n, depth, pair_hit, mpts, mvals, mhit
