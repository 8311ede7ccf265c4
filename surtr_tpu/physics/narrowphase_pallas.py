"""Pallas TPU fused SAT narrowphase + containment manifolds.

Replaces physics/step.py stages 3a/3b on TPU. The XLA version materializes
(Np, K, Vh, F) signed-distance and support tensors in HBM (hundreds of MB
at 10k pieces — the measured ~6.4 ms of the physics step is mostly that
traffic plus per-op overhead); this kernel keeps every per-pair tensor in
VMEM, streaming only packed per-piece columns in and per-pair contact rows
out.

Layout (v2): **batch-minor** — lanes are PAIRS (the clip kernel's proven
SoA pattern), geometry lives on sublanes. Every per-pair scalar is a lane
vector; the distance tensor is (Vh, F, Q) with Q = 2048 pairs per block,
so each vector op covers hundreds of vregs and per-op issue overhead is
amortized (the v1 layout put Vh/F on lanes: 32 of 128 lanes used, measured
33 ms). Inputs are sublane-sliced, so the packed layout needs NO lane
alignment — the per-pair partner gather shrinks ~6× vs v1.

Pair ordering is i-minor within k (pair column q of grid step (k, b) is
piece i = b·Q + q against its k-th candidate), so the i-side input block
is just a column block of the piece table — no in-kernel expansion.

Semantics are identical to the XLA path (same axis families — 26-DOP
intervals, faces of both hulls, edge×edge crosses — same deepest-first
M-point containment manifold with the support-point fallback, same
first-of-ties selection), so the physics tests cover both backends via
``force_pallas_narrowphase``.

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

# Output rows per pair: nx ny nz depth hit, then M × [val, hit, px, py, pz].
def _out_rows(M: int) -> int:
    return ((5 + 6 * M + 7) // 8) * 8


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
    """(offsets dict, D) for the TIGHT packed layout. The kernel slices
    SUBLANES (rows of the transposed table), so no lane alignment is
    needed — fields are packed back to back."""
    offs = {}
    o = 0
    fields = [
        ("wvx", Vh), ("wvy", Vh), ("wvz", Vh), ("wm", Vh),
        ("pnx", F), ("pny", F), ("pnz", F), ("pd", F), ("pm", F),
        ("lod", 13), ("hid", 13),
        ("ex", Ne), ("ey", Ne), ("ez", Ne), ("em", Ne),
    ]
    for name, n in fields:
        if n:
            offs[name] = (o, n)
            o += n
    return offs, o


def pack_pieces(parts: dict, Vh: int, F: int, Ne: int):
    """Assemble the tight (Np, D) table from named per-piece arrays."""
    offs, D = pack_layout(Vh, F, Ne)
    order = sorted(offs.items(), key=lambda kv: kv[1][0])
    cols = [parts[name] for name, _ in order]
    return jnp.concatenate(cols, axis=1)


def _cumsum_rows(x):
    """Inclusive cumsum along the sublane (first) axis via log-step adds."""
    n = x.shape[0]
    k = 1
    while k < n:
        pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[: n - k]], axis=0)
        k *= 2
    return x


def _first_true_rows(mask):
    """Keep only the first True per lane column (stable ties)."""
    return mask & (_cumsum_rows(mask.astype(jnp.int32)) == 1)


def _narrow_kernel(
    pi_ref,     # (D, Q) own piece columns (block b)
    pj_ref,     # (D, Q) k-th partner columns
    ok_ref,     # (1, Q) candidate flag f32
    out_ref,    # (OUT_R, Q)
    *, Vh: int, F: int, Ne: int, M: int, slop: float,
):
    f32 = jnp.float32
    Q = pi_ref.shape[1]
    big = jnp.asarray(BIG, f32)
    offs, _ = pack_layout(Vh, F, Ne)

    def unpack(ref):
        def take(name):
            o, n = offs[name]
            return ref[o : o + n, :]

        return (
            [take("wvx"), take("wvy"), take("wvz")], take("wm"),
            [take("pnx"), take("pny"), take("pnz")], take("pd"), take("pm"),
            take("lod"), take("hid"),
            [take("ex"), take("ey"), take("ez")] if Ne else None,
            take("em") if Ne else None,
        )

    iv, ivm, ipn, ipd, ipm, ilo, ihi, ied, iem = unpack(pi_ref)
    jv, jvm, jpn, jpd, jpm, jlo, jhi, jed, jem = unpack(pj_ref)
    ok = ok_ref[:]                                      # (1, Q)
    ivm3 = ivm[:, None, :]                              # (Vh, 1, Q) f32 0/1
    jvm3 = jvm[:, None, :]

    # --- (1) 26-DOP interval axes (directions are Python constants —
    # Pallas kernels cannot capture constant arrays).
    ov_dop = jnp.minimum(ihi, jhi) - jnp.maximum(ilo, jlo)   # (13, Q)
    flip = (ihi + ilo) < (jhi + jlo)
    sgn = jnp.where(flip, -1.0, 1.0)
    dopx = jnp.concatenate(
        [sgn[a : a + 1] * float(_DOP[a, 0]) for a in range(13)], 0
    )
    dopy = jnp.concatenate(
        [sgn[a : a + 1] * float(_DOP[a, 1]) for a in range(13)], 0
    )
    dopz = jnp.concatenate(
        [sgn[a : a + 1] * float(_DOP[a, 2]) for a in range(13)], 0
    )

    # --- (2) i-verts vs j-planes; (3) j-verts vs i-planes. (Vh, F, Q);
    # masked arithmetically (3D broadcast of i1 trips Mosaic).
    dist_ij = (
        iv[0][:, None, :] * jpn[0][None, :, :]
        + iv[1][:, None, :] * jpn[1][None, :, :]
        + iv[2][:, None, :] * jpn[2][None, :, :]
        + jpd[None, :, :]
    )
    pen_fj = -jnp.min(dist_ij * ivm3 + (1.0 - ivm3) * big, axis=0)  # (F, Q)
    dist_ji = (
        jv[0][:, None, :] * ipn[0][None, :, :]
        + jv[1][:, None, :] * ipn[1][None, :, :]
        + jv[2][:, None, :] * ipn[2][None, :, :]
        + ipd[None, :, :]
    )
    pen_fi = -jnp.min(dist_ji * jvm3 + (1.0 - jvm3) * big, axis=0)

    pens = [ov_dop, pen_fj, pen_fi]
    msks = [jnp.ones((13, Q), f32), jpm, ipm]
    dirx = [dopx, jpn[0], -ipn[0]]
    diry = [dopy, jpn[1], -ipn[1]]
    dirz = [dopz, jpn[2], -ipn[2]]

    im = ivm > 0.5
    jm = jvm > 0.5

    # --- (4) edge×edge cross axes (E2 = Ne² rows).
    if Ne:
        E2 = Ne * Ne
        cx = (
            ied[1][:, None, :] * jed[2][None, :, :]
            - ied[2][:, None, :] * jed[1][None, :, :]
        ).reshape(E2, Q)
        cy = (
            ied[2][:, None, :] * jed[0][None, :, :]
            - ied[0][:, None, :] * jed[2][None, :, :]
        ).reshape(E2, Q)
        cz = (
            ied[0][:, None, :] * jed[1][None, :, :]
            - ied[1][:, None, :] * jed[0][None, :, :]
        ).reshape(E2, Q)
        nl = jnp.sqrt(cx * cx + cy * cy + cz * cz)
        inv = 1.0 / jnp.maximum(nl, 1e-30)
        cx, cy, cz = cx * inv, cy * inv, cz * inv
        emk = (
            (iem[:, None, :] * jem[None, :, :]).reshape(E2, Q)
            * (nl > 1e-6).astype(f32)
        )
        ti = (
            iv[0][:, None, :] * cx[None, :, :]
            + iv[1][:, None, :] * cy[None, :, :]
            + iv[2][:, None, :] * cz[None, :, :]
        )                                               # (Vh, E2, Q)
        tj = (
            jv[0][:, None, :] * cx[None, :, :]
            + jv[1][:, None, :] * cy[None, :, :]
            + jv[2][:, None, :] * cz[None, :, :]
        )
        ilo_e = jnp.min(ti * ivm3 + (1.0 - ivm3) * big, axis=0)   # (E2, Q)
        ihi_e = jnp.max(ti * ivm3 - (1.0 - ivm3) * big, axis=0)
        jlo_e = jnp.min(tj * jvm3 + (1.0 - jvm3) * big, axis=0)
        jhi_e = jnp.max(tj * jvm3 - (1.0 - jvm3) * big, axis=0)
        ov_e = jnp.minimum(ihi_e, jhi_e) - jnp.maximum(ilo_e, jlo_e)
        flip_e = (ihi_e + ilo_e) < (jhi_e + jlo_e)
        se = jnp.where(flip_e, -1.0, 1.0)
        pens.append(ov_e)
        msks.append(emk)
        dirx.append(cx * se)
        diry.append(cy * se)
        dirz.append(cz * se)

    pen_all = jnp.concatenate(pens, axis=0)                   # (A, Q)
    msk_all = jnp.concatenate(msks, axis=0)
    dx_all = jnp.concatenate(dirx, axis=0)
    dy_all = jnp.concatenate(diry, axis=0)
    dz_all = jnp.concatenate(dirz, axis=0)
    pen_all = pen_all * msk_all + (1.0 - msk_all) * big
    depth = jnp.min(pen_all, axis=0, keepdims=True)           # (1, Q)
    sel = _first_true_rows(pen_all == depth).astype(f32)
    nx = jnp.sum(sel * dx_all, axis=0, keepdims=True)
    ny = jnp.sum(sel * dy_all, axis=0, keepdims=True)
    nz = jnp.sum(sel * dz_all, axis=0, keepdims=True)
    hit = (ok > 0.5) & (depth > -slop) & (depth < big / 2)    # (1, Q)

    # --- containment manifold (deepest-first, first-of-ties).
    si_n = iv[0] * nx + iv[1] * ny + iv[2] * nz               # (Vh, Q)
    sj_n = jv[0] * nx + jv[1] * ny + jv[2] * nz
    si_min = jnp.min(jnp.where(im, si_n, big), 0, keepdims=True)
    sj_max = jnp.max(jnp.where(jm, sj_n, -big), 0, keepdims=True)
    jpm3 = jpm[None, :, :]
    ipm3 = ipm[None, :, :]
    inside_j = jnp.max(dist_ij * jpm3 - (1.0 - jpm3) * big, axis=1) <= slop
    inside_i = jnp.max(dist_ji * ipm3 - (1.0 - ipm3) * big, axis=1) <= slop
    depth_iv = sj_max - si_n                                  # (Vh, Q)
    depth_jv = sj_n - si_min
    score_i = jnp.where(inside_j & im, depth_iv, -big)
    score_j = jnp.where(inside_i & jm, depth_jv, -big)
    sc = jnp.concatenate([score_i, score_j], axis=0)          # (2Vh, Q)
    ptx_i = iv[0] + nx * (depth_iv * 0.5)
    pty_i = iv[1] + ny * (depth_iv * 0.5)
    ptz_i = iv[2] + nz * (depth_iv * 0.5)
    ptx_j = jv[0] - nx * (depth_jv * 0.5)
    pty_j = jv[1] - ny * (depth_jv * 0.5)
    ptz_j = jv[2] - nz * (depth_jv * 0.5)

    mv, mh, mpx, mpy, mpz, mfid = [], [], [], [], [], []
    any_m = jnp.zeros((1, Q), bool)
    # Stable contact FEATURE id (PhysX persistent-manifold analogue): the
    # hull-vertex row that generated the point (1..Vh i-side, Vh+1..2Vh
    # j-side) — invariant across steps while the pair rests on the same
    # features, unlike the deepest-first slot ORDER, which permutes as
    # depths jitter. Warm starting matches accumulated impulses by
    # (partner body, feature), so slot permutation noise cannot re-apply
    # an impulse to the wrong point (ROADMAP rejection 2's failure mode).
    # tpu.iota is integer-only — build the row index in i32 and cast.
    ridx = 1.0 + jax.lax.broadcasted_iota(
        jnp.int32, (2 * Vh, Q), 0
    ).astype(f32)
    for _ in range(M):
        mx = jnp.max(sc, axis=0, keepdims=True)
        best = _first_true_rows(sc >= mx).astype(f32)
        bi, bj = best[:Vh], best[Vh:]
        mval = jnp.sum(best * sc, axis=0, keepdims=True)
        px = jnp.sum(bi * ptx_i + bj * ptx_j, axis=0, keepdims=True)
        py = jnp.sum(bi * pty_i + bj * pty_j, axis=0, keepdims=True)
        pz = jnp.sum(bi * ptz_i + bj * ptz_j, axis=0, keepdims=True)
        h = hit & (mval > -slop) & (mval < big / 2)
        mv.append(mval)
        mh.append(h)
        mpx.append(px)
        mpy.append(py)
        mpz.append(pz)
        mfid.append(jnp.sum(best * ridx, axis=0, keepdims=True))
        any_m = any_m | h
        sc = jnp.where(best > 0.5, -big, sc)

    # Fallback: deepest support points (edge-edge crossings contain no
    # vertex of either hull).
    none = hit & ~any_m
    fi = _first_true_rows(
        ((-si_n) >= jnp.max(jnp.where(im, -si_n, -big), 0, keepdims=True))
        & im
    ).astype(f32)
    fj = _first_true_rows(
        (sj_n >= jnp.max(jnp.where(jm, sj_n, -big), 0, keepdims=True)) & jm
    ).astype(f32)
    fx = 0.5 * (
        jnp.sum(fi * iv[0], 0, keepdims=True)
        + jnp.sum(fj * jv[0], 0, keepdims=True)
    )
    fy = 0.5 * (
        jnp.sum(fi * iv[1], 0, keepdims=True)
        + jnp.sum(fj * jv[1], 0, keepdims=True)
    )
    fz = 0.5 * (
        jnp.sum(fi * iv[2], 0, keepdims=True)
        + jnp.sum(fj * jv[2], 0, keepdims=True)
    )
    mpx[0] = jnp.where(none, fx, mpx[0])
    mpy[0] = jnp.where(none, fy, mpy[0])
    mpz[0] = jnp.where(none, fz, mpz[0])
    mv[0] = jnp.where(none, depth, mv[0])
    mh[0] = mh[0] | none
    # Fallback feature: the (i-vert, j-vert) support pair, offset past the
    # containment range (2Vh + i·Vh + j + 1 ≤ 2Vh + Vh² + Vh — exact in f32
    # for Vh ≤ 64).
    riv = 1.0 + jax.lax.broadcasted_iota(
        jnp.int32, (Vh, Q), 0
    ).astype(f32)
    fid_fb = (
        2.0 * Vh
        + jnp.sum(fi * (riv - 1.0), 0, keepdims=True) * Vh
        + jnp.sum(fj * riv, 0, keepdims=True)
    )
    mfid[0] = jnp.where(none, fid_fb, mfid[0])

    rows = [nx, ny, nz, depth, hit.astype(f32)]
    for m in range(M):
        rows += [mv[m], mh[m].astype(f32), mpx[m], mpy[m], mpz[m], mfid[m]]
    out = jnp.concatenate(rows, axis=0)
    pad = out_ref.shape[0] - out.shape[0]
    out_ref[:] = jnp.concatenate(
        [out, jnp.zeros((pad, Q), f32)], axis=0
    )


def narrowphase_raw_pallas(
    packed, pidx, pok,
    Vh: int, F: int, Ne: int, K: int, M: int, slop: float,
    interpret: bool = False, packedT=None, mut=None,
):
    """Raw-kernel variant: returns (out (OUT_R, K·Np_pad), Np_pad) without
    the transpose back to piece-major — the fused prep path consumes row
    slices directly (rows: nx ny nz depth hit, then per manifold point m
    at 5+6m: val hit px py pz fid; lane k·Np_pad+n is piece n's k-th
    pair).
    ``packedT`` (D, Np) skips the transpose (the transform-pack kernel
    already emits this layout)."""
    return _narrowphase_call(
        packed, pidx, pok, Vh=Vh, F=F, Ne=Ne, K=K, M=M, slop=slop,
        interpret=interpret, packedT=packedT, mut=mut,
    )


def narrowphase_pairs_pallas(
    packed, pidx, pok,
    Vh: int, F: int, Ne: int, K: int, M: int, slop: float,
    interpret: bool = False, mut=None,
):
    """packed: (Np, D) tight per-piece tables; pidx: (Np, K) i32 partner
    indices (broadphase candidates); pok: (Np, K) candidate flags.

    Returns (pc_n (Np, K, 3) j→i normals, depth (Np, K), pair_hit (Np, K),
    mpts (Np, K, M, 3), mvals (Np, K, M), mhit (Np, K, M))."""
    out, Np_pad = _narrowphase_call(
        packed, pidx, pok, Vh=Vh, F=F, Ne=Ne, K=K, M=M, slop=slop,
        interpret=interpret, mut=mut,
    )
    Np = packed.shape[0]
    OUT_R = _out_rows(M)
    o = jnp.transpose(
        out.reshape(OUT_R, K, Np_pad), (2, 1, 0)
    )[:Np]                                                  # (Np, K, OUT_R)
    pc_n = o[:, :, 0:3]
    depth = o[:, :, 3]
    pair_hit = o[:, :, 4] > 0.5
    mvrows = o[:, :, 5 : 5 + 6 * M].reshape(Np, K, M, 6)
    mvals = mvrows[..., 0]
    mhit = mvrows[..., 1] > 0.5
    mpts = mvrows[..., 2:5]
    mfid = mvrows[..., 5].astype(jnp.int32)
    return pc_n, depth, pair_hit, mpts, mvals, mhit, mfid


def _narrowphase_call(
    packed, pidx, pok,
    Vh: int, F: int, Ne: int, K: int, M: int, slop: float,
    interpret: bool = False, packedT=None, mut=None,
):
    if packedT is not None:
        D, Np = packedT.shape
    else:
        Np, D = packed.shape
    BQ = 2048 if Np >= 2048 else ((Np + 127) // 128) * 128
    Np_pad = ((Np + BQ - 1) // BQ) * BQ
    NB = Np_pad // BQ
    OUT_R = _out_rows(M)

    # Transposed batch-minor tables: columns are pieces / pairs (i-minor
    # within k — pair column of grid step (k, b) lane q is piece b·BQ+q).
    piT = packedT if packedT is not None else packed.T       # (D, Np)
    if mut is not None:
        # θ-mutual fold (exact broadphase): append θ_j as TWO f32 rows
        # (hi15 | lo15 — i32 keys exceed f32's mantissa) so the partner
        # θ rides the ONE packed gather below instead of its own (Np, K)
        # gather launch (~0.4 ms at 10k on the tunnel).
        key_ji, theta = mut
        th = jnp.stack(
            [
                (theta >> 15).astype(jnp.float32),
                (theta & 32767).astype(jnp.float32),
            ]
        )                                                    # (2, Np)
        piT = jnp.concatenate([piT[:, :Np], th], axis=0)
        D += 2
    piT = jnp.pad(piT[:, :Np], ((0, 0), (0, Np_pad - Np)))   # (D, Np_pad)
    # Partner table directly in transposed layout via one lane gather of
    # the piece table (measured 0.03 ms vs 0.19 for the row-gather +
    # transpose of the (D, K·Np) block). Padded lanes index piece 0 and
    # are masked by ok.
    colidx = jnp.pad(
        jnp.clip(pidx, 0, Np - 1), ((0, Np_pad - Np), (0, 0))
    ).T.reshape(-1)                                          # (K·Np_pad,)
    pjT = jnp.take(piT[:, :Np], colidx, axis=1)
    okT = jnp.pad(
        pok.astype(jnp.float32).T, ((0, 0), (0, Np_pad - Np))
    ).reshape(1, K * Np_pad)
    if mut is not None:
        th_j = (
            pjT[-2].astype(jnp.int32) << 15
        ) | pjT[-1].astype(jnp.int32)                        # (K·Np_pad,)
        kjT = jnp.pad(
            key_ji.T, ((0, 0), (0, Np_pad - Np))
        ).reshape(-1)
        okT = okT * (kjT <= th_j).astype(jnp.float32)[None]

    grid = (K, NB)
    kernel = functools.partial(
        _narrow_kernel, Vh=Vh, F=F, Ne=Ne, M=M, slop=slop
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec(
                (D, BQ), lambda k, b: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, BQ), lambda k, b: (0, k * NB + b),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BQ), lambda k, b: (0, k * NB + b),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (OUT_R, BQ), lambda k, b: (0, k * NB + b),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_R, K * Np_pad), jnp.float32),
        interpret=interpret,
    )(piT, pjT, okT)
    return out, Np_pad
