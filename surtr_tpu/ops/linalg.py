"""Small-contraction helpers.

TPU lowers *batched* tiny matmuls (3×3 matrices batched over thousands of
elements) terribly — each batch element can become its own MXU pass. Every
geometry/physics contraction over a length-3 axis is therefore written as
broadcast-multiply + sum on the VPU (full f32, no bf16 truncation either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dotn(a: jax.Array, b: jax.Array) -> jax.Array:
    """sum(a * b, -1) — explicit elementwise contraction."""
    return jnp.sum(a * b, axis=-1)


def supports(verts: jax.Array, dirs: jax.Array) -> jax.Array:
    """(..., N, 3) · (..., K, 3) → (..., N, K) via VPU broadcast.

    Replaces einsum "...nd,...kd->...nk" (batched tiny matmul)."""
    return jnp.sum(verts[..., :, None, :] * dirs[..., None, :, :], axis=-1)


def matvec3(m: jax.Array, v: jax.Array) -> jax.Array:
    """(..., 3, 3) @ (..., 3) → (..., 3) elementwise."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def rot_points(R: jax.Array, pts: jax.Array) -> jax.Array:
    """Rotate point sets: R (..., 3, 3), pts (..., N, 3) → (..., N, 3)."""
    return jnp.sum(R[..., None, :, :] * pts[..., :, None, :], axis=-1)
