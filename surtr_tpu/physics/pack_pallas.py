"""Pallas TPU fused world-transform + narrowphase packing.

Physics stage 1 (world verts, world planes, world edge dirs, 26-DOP
support intervals, AABBs) is ~12 medium XLA ops plus the pack_pieces
concat and the (Np, D) → (D, Np) transpose the narrowphase kernel wants —
all per-op-overhead/HBM-round-trip bound (~0.9 ms at 10k pieces). This
kernel does the whole stage in one pass with pieces on lanes and emits
the packed table DIRECTLY in the narrowphase's transposed (D, Np) layout
(pack_layout order), plus a (9, Np) AABB table [lo3 | hi3 | center3] for
the broadphase.

Only used on the single/fused TPU path; the XLA stage remains the
reference (CPU tests, non-fused configs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surtr_tpu.physics.narrowphase_pallas import _DOP, pack_layout

BIG = 3.4e38


def _pack_kernel(
    bv_ref,     # (3Vh, BQ) body-frame verts [x | y | z]
    vm_ref,     # (Vh, BQ) i32
    bp_ref,     # (4F, BQ) body planes [nx | ny | nz | d]
    pm_ref,     # (F, BQ) i32
    be_ref,     # (3Ne, BQ) body edge dirs (rows absent when Ne == 0)
    em_ref,     # (Ne, BQ) i32
    qx_ref,     # (8, BQ): qx qy qz qw x y z pvalid
    out_ref,    # (D, BQ) packed (pack_layout order)
    ab_ref,     # (9, BQ) [lo3 | hi3 | center3]
    *, Vh: int, F: int, Ne: int, margin: float,
):
    f32 = jnp.float32
    BQ = vm_ref.shape[-1]
    big = jnp.asarray(BIG, f32)

    qx = qx_ref[0:1, :]
    qy = qx_ref[1:2, :]
    qz = qx_ref[2:3, :]
    qw = qx_ref[3:4, :]
    x0 = qx_ref[4:5, :]
    y0 = qx_ref[5:6, :]
    z0 = qx_ref[6:7, :]
    pv = qx_ref[7:8, :] > 0.5

    # Rotation matrix from the unit quaternion (rigid.quat_to_mat).
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)

    bvx = bv_ref[0:Vh, :]
    bvy = bv_ref[Vh : 2 * Vh, :]
    bvz = bv_ref[2 * Vh :, :]
    vm = vm_ref[:] > 0
    vmf = vm_ref[:].astype(f32)
    wvx = r00 * bvx + r01 * bvy + r02 * bvz + x0
    wvy = r10 * bvx + r11 * bvy + r12 * bvz + y0
    wvz = r20 * bvx + r21 * bvy + r22 * bvz + z0

    pnx_b = bp_ref[0:F, :]
    pny_b = bp_ref[F : 2 * F, :]
    pnz_b = bp_ref[2 * F : 3 * F, :]
    pd_b = bp_ref[3 * F :, :]
    wnx = r00 * pnx_b + r01 * pny_b + r02 * pnz_b
    wny = r10 * pnx_b + r11 * pny_b + r12 * pnz_b
    wnz = r20 * pnx_b + r21 * pny_b + r22 * pnz_b
    wd = pd_b - (wnx * x0 + wny * y0 + wnz * z0)

    # 26-DOP support intervals along the 13 constant directions.
    lod_rows = []
    hid_rows = []
    for a in range(13):
        d0, d1, d2 = float(_DOP[a, 0]), float(_DOP[a, 1]), float(_DOP[a, 2])
        t = wvx * d0 + wvy * d1 + wvz * d2                # (Vh, BQ)
        lod_rows.append(jnp.min(jnp.where(vm, t, big), 0, keepdims=True))
        hid_rows.append(jnp.max(jnp.where(vm, t, -big), 0, keepdims=True))

    rows = [wvx, wvy, wvz, vmf, wnx, wny, wnz, wd,
            pm_ref[:].astype(f32)] + lod_rows + hid_rows
    if Ne:
        bex = be_ref[0:Ne, :]
        bey = be_ref[Ne : 2 * Ne, :]
        bez = be_ref[2 * Ne :, :]
        rows += [
            r00 * bex + r01 * bey + r02 * bez,
            r10 * bex + r11 * bey + r12 * bez,
            r20 * bex + r21 * bey + r22 * bez,
            em_ref[:].astype(f32),
        ]
    out_ref[:] = jnp.concatenate(rows, axis=0)

    lox = jnp.min(jnp.where(vm, wvx, big), 0, keepdims=True) - margin
    loy = jnp.min(jnp.where(vm, wvy, big), 0, keepdims=True) - margin
    loz = jnp.min(jnp.where(vm, wvz, big), 0, keepdims=True) - margin
    hix = jnp.max(jnp.where(vm, wvx, -big), 0, keepdims=True) + margin
    hiy = jnp.max(jnp.where(vm, wvy, -big), 0, keepdims=True) + margin
    hiz = jnp.max(jnp.where(vm, wvz, -big), 0, keepdims=True) + margin
    cx = jnp.where(pv, (lox + hix) * 0.5, big)
    cy = jnp.where(pv, (loy + hiy) * 0.5, big)
    cz = jnp.where(pv, (loz + hiz) * 0.5, big)
    ab_ref[:] = jnp.concatenate(
        [lox, loy, loz, hix, hiy, hiz, cx, cy, cz], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("Vh", "F", "Ne", "margin", "interpret")
)
def transform_pack_pallas(
    piece_verts, piece_vmask, piece_planes, piece_pmask,
    piece_edges, piece_emask, q_own, x_own, pvalid,
    Vh: int, F: int, Ne: int, margin: float, interpret: bool = False,
):
    """All inputs piece-major (Np leading); q_own/x_own are the OWNER
    body's quaternion/position per piece (gathered by the caller).

    Returns (packedT (D, Np) in pack_layout order, aabb (9, Np)
    [lo3 | hi3 | center3-with-BIG-for-invalid])."""
    Np = piece_verts.shape[0]
    BQ = 2048 if Np >= 2048 else ((Np + 127) // 128) * 128
    Np_pad = ((Np + BQ - 1) // BQ) * BQ
    _, D = pack_layout(Vh, F, Ne)

    def padcols(t):
        return jnp.pad(t, ((0, 0), (0, Np_pad - Np)))

    def rowsT(a):  # (Np, R, c) → (c·R, Np): coord-major row groups
        return jnp.transpose(a, (2, 1, 0)).reshape(-1, Np)

    bv = padcols(rowsT(piece_verts))                      # (3Vh, Np_pad)
    vm = padcols(piece_vmask.astype(jnp.int32).T)
    bp = padcols(rowsT(piece_planes))                     # (4F, Np_pad)
    pm = padcols(piece_pmask.astype(jnp.int32).T)
    if Ne:
        be = padcols(rowsT(piece_edges))                  # (3Ne, Np_pad)
        em = padcols(piece_emask.astype(jnp.int32).T)
    else:
        be = jnp.zeros((8, Np_pad), piece_verts.dtype)
        em = jnp.zeros((8, Np_pad), jnp.int32)
    qx = padcols(
        jnp.concatenate(
            [
                jnp.stack(
                    [q_own[:, 1], q_own[:, 2], q_own[:, 3], q_own[:, 0]], 0
                ),
                x_own.T,
                pvalid.astype(piece_verts.dtype)[None],
            ],
            axis=0,
        )
    )                                                     # (8, Np_pad)

    bs = lambda r: pl.BlockSpec(
        (r, BQ), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _pack_kernel, Vh=Vh, F=F, Ne=Ne, margin=margin
    )
    out, ab = pl.pallas_call(
        kernel,
        grid=(Np_pad // BQ,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            bs(3 * Vh), bs(Vh), bs(4 * F), bs(F),
            bs(be.shape[0]), bs(em.shape[0]), bs(8),
        ],
        out_specs=(bs(D), bs(9)),
        out_shape=(
            jax.ShapeDtypeStruct((D, Np_pad), jnp.float32),
            jax.ShapeDtypeStruct((9, Np_pad), jnp.float32),
        ),
        interpret=interpret,
    )(bv, vm, bp, pm, be, em, qx)
    return out[:, :Np], ab[:, :Np]
