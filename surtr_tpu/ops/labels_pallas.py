"""Pallas TPU triangle-soup component labeling.

Batched equivalent of ``vmap(tri_soup_components)``: one block holds 128
candidates on lanes with the full (T, T) corner-coincidence adjacency and
the label state in VMEM, closed by relax + pointer-jump rounds (diameter
2^rounds ≥ T — identical labels to the XLA closure). The XLA "matmul"
scheme batches 64×64 bf16 squarings, exactly the sub-128-matmul shape the
MXU handles poorly (measured 1.15 ms of the cube decomposition and 23 ms
of the pumpkin event); here every op is a full-width VPU pass.

Labels follow ops.labels.tri_soup_components: label = min triangle index
of the component, invalid triangles get T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _labels_kernel(q_ref, vm_ref, lab_ref, *, T: int, rounds: int):
    BN = vm_ref.shape[-1]
    big = jnp.int32(T)

    def qrow(a: int, c: int):
        r = (a * 3 + c) * T
        return q_ref[r : r + T, :]                        # (T, BN) i32

    vm = vm_ref[:] > 0                                    # (T, BN)
    adj = jnp.zeros((T, T, BN), bool)
    for a in range(3):
        qa = [qrow(a, c) for c in range(3)]
        for b in range(3):
            qb = [qrow(b, c) for c in range(3)]
            eq = (
                (qa[0][:, None, :] == qb[0][None, :, :])
                & (qa[1][:, None, :] == qb[1][None, :, :])
                & (qa[2][:, None, :] == qb[2][None, :, :])
            )
            adj = adj | eq
    adj = adj & vm[:, None, :] & vm[None, :, :]

    iota = jax.lax.broadcasted_iota(jnp.int32, (T, BN), 0)
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (T, T, BN), 0)
    lab = jnp.where(vm, iota, big)
    for _ in range(rounds):
        # Relax: min label over adjacent triangles.
        lb = jnp.min(jnp.where(adj, lab[None, :, :], big), axis=1)
        lab = jnp.minimum(lab, jnp.where(vm, lb, big))
        # Pointer jump: lab ← lab[lab] (one-hot select over source rows).
        sel = lab[None, :, :] == iota3                    # sel[j, i] = lab_i==j
        lj = jnp.min(jnp.where(sel, lab[:, None, :], big), axis=0)
        lab = jnp.where(vm, jnp.minimum(lab, lj), big)
    lab_ref[:] = lab


@functools.partial(
    jax.jit, static_argnames=("tol", "iters", "interpret")
)
def tri_soup_components_batch_pallas(
    corners: jax.Array,
    tri_valid: jax.Array,
    tol: float = 1e-5,
    iters: int | None = None,
    interpret: bool = False,
):
    """corners: (N, T, 3, 3); tri_valid: (N, T). Returns (N, T) i32 labels
    (min triangle index per component; invalid → T). ``iters`` caps the
    relax+jump rounds like tri_soup_components' squaring cap (closed
    diameter 2^rounds)."""
    N, T = corners.shape[0], corners.shape[1]
    BN = 128
    Npad = ((N + BN - 1) // BN) * BN
    q = jnp.round(corners / tol).astype(jnp.int32)        # (N, T, 3, 3)
    # Batch-minor rows: row (a*3+c)*T + t = corner a, coord c of tri t.
    qT = jnp.transpose(q, (2, 3, 1, 0)).reshape(9 * T, N)
    qT = jnp.pad(qT, ((0, 0), (0, Npad - N)))
    vmT = jnp.pad(
        tri_valid.astype(jnp.int32).T, ((0, 0), (0, Npad - N))
    )
    # Each relax+jump round at least doubles the closed distance; match the
    # XLA closure's squaring count (capped by ``iters`` like the XLA path).
    rounds = max(1, (max(T - 1, 1)).bit_length())
    if iters is not None:
        rounds = max(1, min(rounds, iters))

    kernel = functools.partial(_labels_kernel, T=T, rounds=rounds)
    bs = lambda r: pl.BlockSpec(
        (r, BN), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    lab = pl.pallas_call(
        kernel,
        grid=(Npad // BN,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[bs(9 * T), bs(T)],
        out_specs=bs(T),
        out_shape=jax.ShapeDtypeStruct((T, Npad), jnp.int32),
        interpret=interpret,
    )(qT, vmT)
    return lab.T[:N]
