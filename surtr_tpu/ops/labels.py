"""Connected-component labeling over triangle soups and adjacency matrices.

Replaces the reference's recursive DFS flood fills:
  * mesh islands — recursion over vertex-adjacency rings
    (_MeshIslandLoop / CheckMeshIsland, /root/reference/Src/Surtr.cpp:2157-2201)
  * convex-island flood fill over the piece contact graph
    (HandleConvexIsland queue fill, Surtr.cpp:2325-2352)

TPU redesign: iterative min-label propagation with pointer jumping (log-depth),
and boolean reachability powering on the MXU for the piece graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters",))
def tri_soup_components(
    corners: jax.Array,
    tri_valid: jax.Array,
    iters: int = 12,
    tol: float = 1e-5,
):
    """Component label per triangle; triangles sharing a (near-)identical
    corner position are connected.

    corners: (T, 3, 3); returns (T,) i32 labels (min triangle index of the
    component; invalid triangles get T).
    """
    T = corners.shape[0]
    pts = corners.reshape(3 * T, 3)
    cm = jnp.repeat(tri_valid, 3)
    # Corner-corner coincidence matrix (3T, 3T).
    d2 = jnp.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
    same = (d2 <= tol * tol) & cm[:, None] & cm[None, :]

    label = jnp.where(tri_valid, jnp.arange(T, dtype=jnp.int32), T)

    def step(label, _):
        cl = jnp.repeat(label, 3)                            # (3T,)
        big = jnp.asarray(T, jnp.int32)
        neigh = jnp.min(jnp.where(same, cl[None, :], big), axis=1)
        new = jnp.minimum(cl, neigh).reshape(T, 3).min(axis=1)
        new = jnp.where(tri_valid, new, T)
        # Pointer jumping: label ← label[label].
        new = jnp.minimum(new, jnp.concatenate([new, jnp.array([T], jnp.int32)])[new])
        return new, None

    label, _ = jax.lax.scan(step, label, None, length=iters)
    return label


@functools.partial(jax.jit, static_argnames=())
def adjacency_components(adj: jax.Array, valid: jax.Array):
    """Component label per node from a boolean adjacency matrix.

    Uses log-step boolean "matrix powering" (reachability closure) — each step
    squares the reachability relation on the MXU — then labels each node by
    the smallest reachable node index.

    adj: (N, N) bool (need not be reflexive/symmetric-clean);
    valid: (N,) bool. Returns (N,) i32 labels (min reachable index; invalid
    nodes get N).
    """
    N = adj.shape[0]
    a = (adj | adj.T) & valid[:, None] & valid[None, :]
    r = a | jnp.eye(N, dtype=bool)
    # ceil(log2(N)) squarings: r ← r ∘ r.
    steps = max(1, (N - 1).bit_length())
    rf = r.astype(jnp.float32)
    for _ in range(steps):
        rf = jnp.minimum(
            rf
            + jnp.einsum(
                "ij,jk->ik", rf, rf, precision=jax.lax.Precision.DEFAULT
            ),
            1.0,
        )
    reach = rf > 0.5
    idx = jnp.arange(N, dtype=jnp.int32)
    label = jnp.min(jnp.where(reach, idx[None, :], N), axis=1)
    return jnp.where(valid, label, N)
