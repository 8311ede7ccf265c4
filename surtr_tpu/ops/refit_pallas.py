"""Pallas TPU batched refit planes (tetra hull + k-DOP slabs).

Batched equivalent of ``vmap(refit_planes)`` for the ``limit <= 4`` path
(the production default, RefittingPointLimit=4 — Surtr.h:93): the seed
tetrahedron's four greedy extreme points, its outward face normals, and
the zero-gap slab planes, all per candidate on lanes with the vertex pool
on sublanes. The vmapped XLA chain is ~25 small ops per extreme
(per-op-overhead-bound, the largest slice of the decomposition's finish
stage); here the whole refit is one kernel.

Semantics mirror ops.hull.tetra_hull + ops.kdop.kdop_planes(gap=0)
(first-of-ties extreme selection, outward orientation against the
tetra centroid, [4 max planes; 4 min planes] ordering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38


def _cumsum_rows(x):
    n = x.shape[0]
    k = 1
    while k < n:
        pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[: n - k]], axis=0)
        k *= 2
    return x


def _refit_kernel(
    vx_ref, vy_ref, vz_ref, vm_ref,
    pl_ref, pm_ref,
    *, Pv: int,
):
    f32 = jnp.float32
    BN = vm_ref.shape[-1]
    vm = vm_ref[:] > 0                                    # (Pv, BN)
    vx, vy, vz = vx_ref[:], vy_ref[:], vz_ref[:]
    neg = jnp.asarray(NEG, f32)

    def at_max(score):
        """First-of-ties masked argmax → point coords ((1, BN) each)."""
        sc = jnp.where(vm, score, neg)
        mx = jnp.max(sc, axis=0, keepdims=True)
        m = sc >= mx
        first = m & (_cumsum_rows(m.astype(jnp.int32)) == 1)
        w = first.astype(f32)
        return (
            jnp.sum(w * vx, 0, keepdims=True),
            jnp.sum(w * vy, 0, keepdims=True),
            jnp.sum(w * vz, 0, keepdims=True),
        )

    p1x, p1y, p1z = at_max(vx)
    d1 = (vx - p1x) ** 2 + (vy - p1y) ** 2 + (vz - p1z) ** 2
    p2x, p2y, p2z = at_max(d1)
    ex, ey, ez = p2x - p1x, p2y - p1y, p2z - p1z          # (1, BN)
    rx, ry, rz = vx - p1x, vy - p1y, vz - p1z
    cx = ey * rz - ez * ry
    cy = ez * rx - ex * rz
    cz = ex * ry - ey * rx
    p3x, p3y, p3z = at_max(cx * cx + cy * cy + cz * cz)
    # v4 = det(p1-v, p2-v, p3-v)
    ax, ay, az = p1x - vx, p1y - vy, p1z - vz
    bx, by, bz = p2x - vx, p2y - vy, p2z - vz
    gx, gy, gz = p3x - vx, p3y - vy, p3z - vz
    v4 = (
        ax * (by * gz - bz * gy)
        + ay * (bz * gx - bx * gz)
        + az * (bx * gy - by * gx)
    )
    p4x, p4y, p4z = at_max(v4)

    ix = (p1x + p2x + p3x + p4x) * 0.25
    iy = (p1y + p2y + p3y + p4y) * 0.25
    iz = (p1z + p2z + p3z + p4z) * 0.25

    pts = (
        (p1x, p1y, p1z), (p2x, p2y, p2z), (p3x, p3y, p3z), (p4x, p4y, p4z)
    )
    tets = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))
    rows_pl = []
    rows_pm = []
    any_vert = jnp.any(vm, axis=0, keepdims=True)
    enough = jnp.sum(vm.astype(jnp.int32), 0, keepdims=True) >= 4
    pm_base = any_vert & enough                           # (1, BN)
    min_rows_pl = []
    for (fa, fb, fc) in tets:
        fax, fay, faz = pts[fa]
        fbx, fby, fbz = pts[fb]
        fcx, fcy, fcz = pts[fc]
        ux, uy, uz = fbx - fax, fby - fay, fbz - faz
        wx, wy, wz = fcx - fax, fcy - fay, fcz - faz
        nx = uy * wz - uz * wy
        ny = uz * wx - ux * wz
        nz = ux * wy - uy * wx
        s = nx * (ix - fax) + ny * (iy - fay) + nz * (iz - faz)
        flip = s > 0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)
        ln = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        ok = ln > 1e-20
        inv = 1.0 / jnp.maximum(ln, 1e-30)
        okf = ok.astype(f32)
        nx, ny, nz = nx * inv * okf, ny * inv * okf, nz * inv * okf
        t = vx * nx + vy * ny + vz * nz                   # (Pv, BN)
        tmax = jnp.max(jnp.where(vm, t, neg), 0, keepdims=True)
        tmin = jnp.min(jnp.where(vm, t, -neg), 0, keepdims=True)
        rows_pl += [nx, ny, nz, -tmax]
        min_rows_pl += [-nx, -ny, -nz, tmin]
        rows_pm.append((ok & pm_base).astype(jnp.int32))
    pl_ref[:] = jnp.concatenate(rows_pl + min_rows_pl, axis=0)  # (32, BN)
    pm_ref[:] = jnp.concatenate(rows_pm + rows_pm, axis=0)      # (8, BN)


@functools.partial(jax.jit, static_argnames=("interpret",))
def refit_planes_batch_pallas(
    pool: jax.Array, pool_mask: jax.Array, interpret: bool = False
):
    """pool: (N, Pv, 3); pool_mask: (N, Pv). Returns ((N, 8, 4), (N, 8))
    matching vmap(refit_planes)(…, limit=4)."""
    N, Pv = pool.shape[0], pool.shape[1]
    BN = 128
    Npad = ((N + BN - 1) // BN) * BN

    def padT(a):
        return jnp.pad(a.T, ((0, 0), (0, Npad - N)))

    vx = padT(pool[..., 0])
    vy = padT(pool[..., 1])
    vz = padT(pool[..., 2])
    vm = padT(pool_mask.astype(jnp.int32))

    bs = lambda r: pl.BlockSpec(
        (r, BN), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    pl_t, pm_t = pl.pallas_call(
        functools.partial(_refit_kernel, Pv=Pv),
        grid=(Npad // BN,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[bs(Pv)] * 4,
        out_specs=(bs(32), bs(8)),
        out_shape=(
            jax.ShapeDtypeStruct((32, Npad), jnp.float32),
            jax.ShapeDtypeStruct((8, Npad), jnp.int32),
        ),
        interpret=interpret,
    )(vx, vy, vz, vm)
    planes = jnp.transpose(pl_t.reshape(8, 4, Npad), (2, 0, 1))[:N]
    pmask = pm_t.T[:N] > 0
    return planes, pmask
