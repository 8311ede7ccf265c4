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


@functools.partial(jax.jit, static_argnames=("iters", "method"))
def tri_soup_components(
    corners: jax.Array,
    tri_valid: jax.Array,
    iters: int | None = None,
    tol: float = 1e-5,
    method: str | None = None,
):
    """Component label per triangle; triangles sharing a (near-)identical
    corner position are connected.

    corners: (T, 3, 3); returns (T,) i32 labels (min triangle index of the
    component; invalid triangles get T).

    Design: one corner-coincidence pass (exact equality of tol-quantized
    coordinate triples — a multiply-XOR spatial hash collides
    systematically on symmetric meshes and sorted-run unioning costs a
    ~50 ms batched sort at fracture scale) reduces to a (T, T) triangle
    adjacency, closed by one of two equivalent schemes (``method``,
    default per backend — both give identical labels, diameter ~2^iters):

    * ``"matmul"`` (TPU): ceil(log2 T) boolean matrix squarings in bf16 on
      the MXU (0/1 exact in bf16; counts accumulate in f32). O(T³) per
      squaring but MXU-native — measured 2.4× faster than relax+jump at
      fracture shapes (T≈64×1024 candidates), where the jump gather is
      the bottleneck.
    * ``"jump"`` (CPU): min-label relaxation over adjacency rows plus
      pointer jumping (``lab ← lab[lab]``). O(T²) per round — the
      squarings cost ~1.6 TFLOP per candidate at T=4096 and dominated
      the CPU test suite (12 s/candidate); relax+jump is ~1000× cheaper
      there.
    """
    if method is None:
        from surtr_tpu.ops.clip_pallas import _target_is_tpu

        method = "matmul" if _target_is_tpu() else "jump"
    T = corners.shape[0]
    q = jnp.round(corners / tol).astype(jnp.int32)       # (T, 3, 3)
    # Triangle adjacency via 9 fused corner-pair equality tests — an
    # explicit (3T, 3T) coincidence matrix materializes ~40 MB per fracture
    # event and dominated the labeling cost.
    adj = jnp.zeros((T, T), bool)
    for a in range(3):
        for b in range(3):
            adj = adj | jnp.all(
                q[:, None, a, :] == q[None, :, b, :], axis=-1
            )
    adj = adj & tri_valid[:, None] & tri_valid[None]
    steps = max(1, (T - 1).bit_length())
    if iters is not None:
        steps = min(steps, iters)
    idx = jnp.arange(T, dtype=jnp.int32)
    if method == "matmul":
        rb = (adj | jnp.eye(T, dtype=bool)).astype(jnp.bfloat16)
        for _ in range(steps):
            acc = jnp.dot(rb, rb, preferred_element_type=jnp.float32)
            rb = (acc > 0.5).astype(jnp.bfloat16)
        reach = rb > 0.5
        label = jnp.min(jnp.where(reach, idx[None, :], T), axis=1)
        return jnp.where(tri_valid, label, T)
    lab = jnp.where(tri_valid, idx, T)
    for _ in range(steps):
        nb = jnp.min(jnp.where(adj, lab[None, :], T), axis=1)
        lab = jnp.minimum(lab, nb)
        lab = jnp.minimum(lab, lab[jnp.clip(lab, 0, T - 1)])
    return jnp.where(tri_valid, lab, T)


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
