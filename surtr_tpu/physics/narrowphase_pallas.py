"""Pallas TPU fused SAT narrowphase + containment manifolds.

Replaces physics/step.py stages 3a/3b on TPU. The XLA version materializes
(Np, K, Vh, F) signed-distance and support tensors in HBM (~330 MB each at
10k pieces — the measured ~6.6 ms of the physics step is mostly this
traffic); this kernel keeps every per-pair tensor in VMEM, streaming only
the packed per-piece tables in and per-pair contact slots out.

Grid layout: ``(row blocks, K)`` — each grid step handles ONE pair slot of
one row block, with the k-th partner rows streamed by the BlockSpec
(k-unrolling the whole pair loop into the kernel body made the Mosaic
program ~8x larger and pushed remote compiles past 10 minutes). The i-side
block is revisited (constant index for consecutive k), so it is fetched
once per row block.

Semantics are identical to the XLA path (same axis families — 26-DOP
intervals, faces of both hulls, edge×edge crosses — same deepest-first
M-point containment manifold with the support-point fallback, same
first-of-ties selection), so the physics tests cover both backends via
``force_pallas_narrowphase``.

Packed planar per-piece layout (``pack_layout``): nine 128-lane-ALIGNED
fields [wvx, wvy, wvz, wmask, pnx, pny, pnz, pd, pmask] — every field that
feeds a (BN, ·, ·) broadcast must start at lane offset ≡ 0 mod 128 because
Mosaic cannot reshape a lane-offset vector to 3D — then the tight 2D-only
tail [lo_dop, hi_dop, ex, ey, ez, emask, ok], padded to a 128-multiple D.
The partner table additionally carries the per-(i,k) candidate flag in its
reserved ``ok`` lane.

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

# Output row layout (per pair slot, lanes): nx ny nz depth hit, then
# M manifold lanes each of [val, hit, px, py, pz].
OUT_LANES = 128

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
    for name in ("wvx", "wvy", "wvz", "wm", "pnx", "pny", "pnz", "pd", "pm"):
        n = Vh if name in ("wvx", "wvy", "wvz", "wm") else F
        offs[name] = (o, n)
        o += 128
    for name, n in (
        ("lod", 13), ("hid", 13),
        ("ex", Ne), ("ey", Ne), ("ez", Ne), ("em", Ne),
        ("ok", 1),
    ):
        offs[name] = (o, n)
        o += n
    D = ((o + 127) // 128) * 128
    return offs, D


def pack_pieces(parts: dict, Vh: int, F: int, Ne: int):
    """Assemble the aligned (Np, D) table from named per-piece arrays."""
    offs, D = pack_layout(Vh, F, Ne)
    Np = parts["wvx"].shape[0]
    cols = []
    o = 0
    for name in ("wvx", "wvy", "wvz", "wm", "pnx", "pny", "pnz", "pd", "pm",
                 "lod", "hid", "ex", "ey", "ez", "em", "ok"):
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
    pi_ref,     # (BN, D) own packed rows (revisited across k)
    pj_ref,     # (BN, D) k-th partner packed rows (incl. the ok lane)
    out_ref,    # (BN, OUT_LANES) per-pair contact outputs
    *, Vh: int, F: int, Ne: int, M: int, slop: float,
):
    f32 = jnp.float32
    BN = pi_ref.shape[0]
    big = jnp.asarray(BIG, f32)
    offs, _ = pack_layout(Vh, F, Ne)

    def unpack(ref):
        def take(name):
            o, n = offs[name]
            return ref[:, o : o + n]

        return (
            [take("wvx"), take("wvy"), take("wvz")], take("wm"),
            [take("pnx"), take("pny"), take("pnz")], take("pd"), take("pm"),
            take("lod"), take("hid"),
            [take("ex"), take("ey"), take("ez")] if Ne else None,
            take("em") if Ne else None,
            take("ok"),
        )

    iv, ivm, ipn, ipd, ipm, ilo, ihi, ied, iem, _ = unpack(pi_ref)
    jv, jvm, jpn, jpd, jpm, jlo, jhi, jed, jem, jok = unpack(pj_ref)
    ok = jok                                            # (BN, 1)
    ivm3 = ivm[:, :, None]                              # (BN, Vh, 1) f32 0/1
    jvm3 = jvm[:, :, None]

    # --- (1) 26-DOP interval axes (directions are Python constants —
    # Pallas kernels cannot capture constant arrays).
    ov_dop = jnp.minimum(ihi, jhi) - jnp.maximum(ilo, jlo)   # (BN, 13)
    flip = (ihi + ilo) < (jhi + jlo)
    sgn = jnp.where(flip, -1.0, 1.0)
    dopx = jnp.concatenate(
        [sgn[:, a : a + 1] * float(_DOP[a, 0]) for a in range(13)], 1
    )
    dopy = jnp.concatenate(
        [sgn[:, a : a + 1] * float(_DOP[a, 1]) for a in range(13)], 1
    )
    dopz = jnp.concatenate(
        [sgn[:, a : a + 1] * float(_DOP[a, 2]) for a in range(13)], 1
    )

    # --- (2) i-verts vs j-planes; (3) j-verts vs i-planes. (BN, Vh, F);
    # masked arithmetically (3D broadcast of i1 trips Mosaic).
    dist_ij = (
        iv[0][:, :, None] * jpn[0][:, None, :]
        + iv[1][:, :, None] * jpn[1][:, None, :]
        + iv[2][:, :, None] * jpn[2][:, None, :]
        + jpd[:, None, :]
    )
    pen_fj = -jnp.min(dist_ij * ivm3 + (1.0 - ivm3) * big, axis=1)
    dist_ji = (
        jv[0][:, :, None] * ipn[0][:, None, :]
        + jv[1][:, :, None] * ipn[1][:, None, :]
        + jv[2][:, :, None] * ipn[2][:, None, :]
        + ipd[:, None, :]
    )
    pen_fi = -jnp.min(dist_ji * jvm3 + (1.0 - jvm3) * big, axis=1)

    pens = [ov_dop, pen_fj, pen_fi]
    msks = [jnp.ones((BN, 13), f32), jpm, ipm]
    dirx = [dopx, jpn[0], -ipn[0]]
    diry = [dopy, jpn[1], -ipn[1]]
    dirz = [dopz, jpn[2], -ipn[2]]

    im = ivm > 0.5
    jm = jvm > 0.5

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
                nl = jnp.sqrt(cx * cx + cy * cy + cz * cz)
                inv = 1.0 / jnp.maximum(nl, 1e-30)
                cx, cy, cz = cx * inv, cy * inv, cz * inv
                emk = (
                    iem[:, a : a + 1]
                    * jem[:, b : b + 1]
                    * (nl > 1e-6).astype(f32)
                )
                ti = iv[0] * cx + iv[1] * cy + iv[2] * cz     # (BN, Vh)
                tj = jv[0] * cx + jv[1] * cy + jv[2] * cz
                ilo_e = jnp.min(jnp.where(im, ti, big), 1, keepdims=True)
                ihi_e = jnp.max(jnp.where(im, ti, -big), 1, keepdims=True)
                jlo_e = jnp.min(jnp.where(jm, tj, big), 1, keepdims=True)
                jhi_e = jnp.max(jnp.where(jm, tj, -big), 1, keepdims=True)
                ov_e = jnp.minimum(ihi_e, jhi_e) - jnp.maximum(ilo_e, jlo_e)
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
    hit = (ok > 0.5) & (depth > -slop) & (depth < big / 2)    # (BN, 1)

    # --- containment manifold (deepest-first, first-of-ties).
    si_n = iv[0] * nx + iv[1] * ny + iv[2] * nz               # (BN, Vh)
    sj_n = jv[0] * nx + jv[1] * ny + jv[2] * nz
    si_min = jnp.min(jnp.where(im, si_n, big), 1, keepdims=True)
    sj_max = jnp.max(jnp.where(jm, sj_n, -big), 1, keepdims=True)
    jpm3 = jpm[:, None, :]
    ipm3 = ipm[:, None, :]
    inside_j = jnp.max(dist_ij * jpm3 - (1.0 - jpm3) * big, axis=2) <= slop
    inside_i = jnp.max(dist_ji * ipm3 - (1.0 - ipm3) * big, axis=2) <= slop
    depth_iv = sj_max - si_n                                  # (BN, Vh)
    depth_jv = sj_n - si_min
    score_i = jnp.where(inside_j & im, depth_iv, -big)
    score_j = jnp.where(inside_i & jm, depth_jv, -big)
    sc = jnp.concatenate([score_i, score_j], axis=1)          # (BN, 2Vh)
    ptx_i = iv[0] + nx * (depth_iv * 0.5)
    pty_i = iv[1] + ny * (depth_iv * 0.5)
    ptz_i = iv[2] + nz * (depth_iv * 0.5)
    ptx_j = jv[0] - nx * (depth_jv * 0.5)
    pty_j = jv[1] - ny * (depth_jv * 0.5)
    ptz_j = jv[2] - nz * (depth_jv * 0.5)

    mv, mh, mpx, mpy, mpz = [], [], [], [], []
    any_m = jnp.zeros((BN, 1), bool)
    for m in range(M):
        mx = jnp.max(sc, axis=1, keepdims=True)
        best = _first_true(sc >= mx).astype(f32)
        bi, bj = best[:, :Vh], best[:, Vh:]
        mval = jnp.sum(best * sc, axis=1, keepdims=True)
        px = jnp.sum(bi * ptx_i + bj * ptx_j, axis=1, keepdims=True)
        py = jnp.sum(bi * pty_i + bj * pty_j, axis=1, keepdims=True)
        pz = jnp.sum(bi * ptz_i + bj * ptz_j, axis=1, keepdims=True)
        h = hit & (mval > -slop) & (mval < big / 2)
        mv.append(mval)
        mh.append(h)
        mpx.append(px)
        mpy.append(py)
        mpz.append(pz)
        any_m = any_m | h
        sc = jnp.where(best > 0.5, -big, sc)

    # Fallback: deepest support points (edge-edge crossings contain no
    # vertex of either hull).
    none = hit & ~any_m
    fi = _first_true(
        ((-si_n) >= jnp.max(jnp.where(im, -si_n, -big), 1, keepdims=True))
        & im
    ).astype(f32)
    fj = _first_true(
        (sj_n >= jnp.max(jnp.where(jm, sj_n, -big), 1, keepdims=True)) & jm
    ).astype(f32)
    fx = 0.5 * (
        jnp.sum(fi * iv[0], 1, keepdims=True)
        + jnp.sum(fj * jv[0], 1, keepdims=True)
    )
    fy = 0.5 * (
        jnp.sum(fi * iv[1], 1, keepdims=True)
        + jnp.sum(fj * jv[1], 1, keepdims=True)
    )
    fz = 0.5 * (
        jnp.sum(fi * iv[2], 1, keepdims=True)
        + jnp.sum(fj * jv[2], 1, keepdims=True)
    )
    mpx[0] = jnp.where(none, fx, mpx[0])
    mpy[0] = jnp.where(none, fy, mpy[0])
    mpz[0] = jnp.where(none, fz, mpz[0])
    mv[0] = jnp.where(none, depth, mv[0])
    mh[0] = mh[0] | none

    cols = [nx, ny, nz, depth, hit.astype(f32)]
    for m in range(M):
        cols += [mv[m], mh[m].astype(f32), mpx[m], mpy[m], mpz[m]]
    out = jnp.concatenate(cols, axis=1)
    pad = OUT_LANES - out.shape[1]
    out_ref[:] = jnp.concatenate(
        [out, jnp.zeros((BN, pad), f32)], axis=1
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
    partner rows (k-major) with the reserved ``ok`` lane of every row
    holding the per-(i,k) candidate flag; pok is folded into those lanes
    here (kept as an argument so the caller stays backend-agnostic).

    Returns (pc_n (Np, K, 3) j→i normals, depth (Np, K), pair_hit (Np, K),
    mpts (Np, K·M, 3) tiled slot order, mvals (Np, K·M), mhit (Np, K·M)).
    """
    Np, D = packed.shape
    offs, _ = pack_layout(Vh, F, Ne)
    ok_lane = offs["ok"][0]
    BN = 256
    Np_pad = ((Np + BN - 1) // BN) * BN
    MK = M * K

    pj3 = pj_flat.reshape(Np, K, D)
    pj3 = pj3.at[:, :, ok_lane].set(pok.astype(pj3.dtype))
    pj_flat = pj3.reshape(Np, K * D)

    padr = lambda a: jnp.pad(a, ((0, Np_pad - Np), (0, 0)))
    pi_p = padr(packed)
    pj_p = padr(pj_flat)

    grid = (Np_pad // BN, K)
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
                (BN, D), lambda b, k: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BN, D), lambda b, k: (b, k), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BN, OUT_LANES), lambda b, k: (b, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Np_pad, K * OUT_LANES), jnp.float32
        ),
        interpret=interpret,
    )(pi_p, pj_p)

    o = out[:Np].reshape(Np, K, OUT_LANES)
    pc_n = o[:, :, 0:3]                                # (Np, K, 3)
    depth = o[:, :, 3]
    pair_hit = o[:, :, 4] > 0.5
    mv = o[:, :, 5 : 5 + 5 * M].reshape(Np, K, M, 5)
    # tiled slot order (slot = m·K + k)
    mvals = jnp.transpose(mv[..., 0], (0, 2, 1)).reshape(Np, MK)
    mhit = jnp.transpose(mv[..., 1], (0, 2, 1)).reshape(Np, MK) > 0.5
    mpts = jnp.transpose(mv[..., 2:5], (0, 2, 1, 3)).reshape(Np, MK, 3)
    return pc_n, depth, pair_hit, mpts, mvals, mhit
