"""Polytope moments: volume, centroid, inertia.

Volume/centroid follow the divergence-theorem fan accumulation of the
reference's ``Poly::Moments`` (/root/reference/Src/Poly.cpp:55-87): for each
face, fan triangles (p0, pk, pk+1) contribute dV = p0·(pk × pk+1) (6× signed
tet volume against a shifted origin); V = Σ dV / 6 and the centroid is
Σ (p0+pk+pk+1)·dV / (24 V) + origin.

The inertia tensor (needed by the physics engine that replaces PhysX's
``updateMassAndInertia``, Surtr.cpp:2520) integrates the second moment over
the same signed tetrahedra: for a tet (o, a, b, c),
∫ x xᵀ dV = det/120 · (Σᵢ pᵢpᵢᵀ + s sᵀ) with s = a+b+c (shifted by o), then
I = ρ (tr(C) Id − C) about the centroid via parallel-axis transfer.

All functions are masked over the padded (F, S) layout and vmap/batch cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surtr_tpu.types import ConvexPoly


def _fan_terms(poly: ConvexPoly):
    """Shared fan setup. Returns (origin, p0, pk, pk1, fan_mask) with shapes
    (...,3), (...,F,1,3), (...,F,S,3), (...,F,S,3), (...,F,S)."""
    fv = poly.face_verts
    nv = poly.n_verts
    S = poly.S
    sm = poly.slot_mask()
    total = jnp.maximum(jnp.sum(sm, axis=(-1, -2), keepdims=True), 1)
    origin = jnp.sum(
        jnp.where(sm[..., None], fv, 0.0), axis=(-2, -3)
    ) / jnp.squeeze(total, (-1, -2))[..., None]
    p = fv - origin[..., None, None, :]
    slot = jnp.arange(S, dtype=jnp.int32)
    # Fan triangle k: (p[0], p[k], p[k+1]) for k = 1..n-2.
    fan_mask = (slot[None, :] >= 1) & (slot[None, :] <= nv[..., None] - 2)
    fan_mask = fan_mask & poly.face_mask()[..., None]
    p0 = p[..., :, 0:1, :]
    pk = p
    pk1 = jnp.roll(p, -1, axis=-2)
    return origin, p0, pk, pk1, fan_mask


def moments(poly: ConvexPoly):
    """Returns (volume, centroid); batch-shaped."""
    origin, p0, pk, pk1, fm = _fan_terms(poly)
    dV = jnp.sum(p0 * jnp.cross(pk, pk1), axis=-1)          # (..., F, S)
    dV = jnp.where(fm, dV, 0.0)
    vol = jnp.sum(dV, axis=(-1, -2)) / 6.0
    csum = jnp.sum(
        (p0 + pk + pk1) * dV[..., None], axis=(-2, -3)
    )
    denom = 24.0 * vol
    safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    centroid = csum / safe[..., None] + origin
    centroid = jnp.where(jnp.abs(vol)[..., None] > 1e-30, centroid, origin)
    return vol, centroid


def inertia(poly: ConvexPoly, density: float = 10.0):
    """Returns (mass, com, I_com) with I_com the 3×3 inertia about the
    centroid (density matches the reference's updateMassAndInertia(10))."""
    origin, p0, pk, pk1, fm = _fan_terms(poly)
    dV = jnp.sum(p0 * jnp.cross(pk, pk1), axis=-1)
    dV = jnp.where(fm, dV, 0.0)                               # (..., F, S)
    vol = jnp.sum(dV, axis=(-1, -2)) / 6.0

    # Second moment about the shifted origin.
    a, b, c = jnp.broadcast_to(p0, pk.shape), pk, pk1
    s = a + b + c
    outer = lambda x: x[..., :, None] * x[..., None, :]
    c_tet = outer(a) + outer(b) + outer(c) + outer(s)         # (..., F, S, 3, 3)
    C = jnp.sum(c_tet * dV[..., None, None], axis=(-3, -4)) / 120.0

    csum = jnp.sum((a + b + c) * dV[..., None], axis=(-2, -3))
    denom = 24.0 * vol
    safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    com_local = csum / safe[..., None]                        # about origin
    com = com_local + origin

    # Parallel-axis: C about the centroid.
    C_c = C - vol[..., None, None] * outer(com_local)
    mass = density * vol
    eye = jnp.eye(3, dtype=C.dtype)
    I_com = density * (
        jnp.trace(C_c, axis1=-2, axis2=-1)[..., None, None] * eye - C_c
    )
    return mass, com, I_com


def aabb(poly: ConvexPoly):
    """Masked axis-aligned bounds: returns (min, max) each (..., 3)."""
    sm = poly.slot_mask()[..., None]
    big = jnp.asarray(3.4e38, poly.face_verts.dtype)
    lo = jnp.min(jnp.where(sm, poly.face_verts, big), axis=(-2, -3))
    hi = jnp.max(jnp.where(sm, poly.face_verts, -big), axis=(-2, -3))
    return lo, hi


def all_verts(poly: ConvexPoly):
    """Flattened (possibly duplicated) vertex pool: ((..., F*S, 3), mask)."""
    fv = poly.face_verts.reshape(poly.batch_shape + (poly.F * poly.S, 3))
    m = poly.slot_mask().reshape(poly.batch_shape + (poly.F * poly.S,))
    return fv, m
