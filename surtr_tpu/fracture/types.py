"""Fracture-pipeline state pytrees.

``PieceSet`` is the padded, flat replacement for the reference's
``FractureStorage::CompoundVec`` of heap ``Piece*`` vectors
(/root/reference/Inc/Surtr.h:112-155): every piece of every compound lives in
one fixed-capacity array; compound membership is the ``group`` label (the
analogue of the reference's ``CompoundBind`` index sets)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from surtr_tpu.types import ConvexPoly


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PieceSet:
    """A flat pool of fracture pieces.

    convex:     ConvexPoly, batch (P,) — collision/solid proxy (world frame).
    mesh:       (P, T, 3, 3) f32 — visual triangle corners (world frame).
    mesh_valid: (P, T) bool.
    valid:      (P,) bool — slot occupancy.
    group:      (P,) i32 — compound id (>= 0); pieces of the same group move
                as one rigid body.
    tag:        (P,) i32 — caller payload riding through fracture/compaction
                (the scene layer stores the owning body id here so untouched
                compounds keep their velocities across a fracture event;
                freshly cut fragments carry -1 = spawn at rest, matching the
                reference's velocity-free actor creation, Surtr.cpp:2507).
    """

    convex: ConvexPoly
    mesh: jax.Array
    mesh_valid: jax.Array
    valid: jax.Array
    group: jax.Array
    tag: jax.Array

    @property
    def P(self) -> int:
        return self.valid.shape[-1]

    @property
    def T(self) -> int:
        return self.mesh.shape[-3]

    def num_pieces(self):
        return jnp.sum(self.valid)

    def num_groups(self):
        g = jnp.where(self.valid, self.group, -1)
        # number of distinct non-negative group ids
        sg = jnp.sort(g)
        new = (sg != jnp.roll(sg, 1)) | (jnp.arange(self.P) == 0)
        return jnp.sum(new & (sg >= 0))


def empty_piece_set(P: int, T: int, F: int, S: int, dtype=jnp.float32) -> PieceSet:
    from surtr_tpu.types import empty_poly

    return PieceSet(
        convex=empty_poly(F, S, (P,), dtype),
        mesh=jnp.zeros((P, T, 3, 3), dtype),
        mesh_valid=jnp.zeros((P, T), bool),
        valid=jnp.zeros((P,), bool),
        group=jnp.full((P,), -1, jnp.int32),
        tag=jnp.full((P,), -1, jnp.int32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FractureContext:
    """Per-model fracture state computed once at prepare time — the analogue
    of FractureStorage's BB fields + cached patterns (Surtr.h:142-155).

    Pattern cells are stored in *unit space* (the voro++ unit-cube container,
    Surtr.cpp:2007) and get scaled by 2×max_axis_scale and translated to the
    impact point per event (DoFracture, Surtr.cpp:1887-1915)."""

    bb_center: jax.Array        # (3,)
    bb_min: jax.Array           # (3,)
    bb_max: jax.Array           # (3,)
    max_axis_scale: jax.Array   # ()
    partial_pattern: ConvexPoly  # (C_p,) cells, unit space
    general_pattern: ConvexPoly  # (C_g,) cells, unit space
    sphere_cloud: jax.Array     # (42, 3) unit impact-sphere point cloud (r=0.5)
