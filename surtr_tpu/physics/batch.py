"""Batched multi-scene rigid-body stepping — ROADMAP feature 9: config 2
("64 meshes in parallel") extended from decomposition to DYNAMICS.

The scene batch is the same scaling axis as the mesh batch (SURVEY §2.3):
on one chip a memory-bounded ``lax.map`` over scenes (each element already
saturates the chip via the inner piece/pair vectorization); across chips it
shards with ``shard_map`` over a 1-D device mesh, with per-scene metrics
psum'd into global tallies (the reference is single-scene — PhysX gScene,
/root/reference/Src/Surtr.cpp:330 — so this axis has no reference analogue
beyond running N copies of the app).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from surtr_tpu.config import PhysicsConfig
from surtr_tpu.physics.step import physics_step


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def batch_step(scenes, cfg: PhysicsConfig, n_steps: int = 1):
    """Step M independent scenes (stacked PhysicsScene pytree, leading (M,)
    axis on every leaf). Returns the stepped batch."""

    def one(scene):
        def body(s, _):
            return physics_step(s, cfg), None

        return jax.lax.scan(body, scene, None, length=n_steps)[0]

    return jax.lax.map(one, scenes)


def sharded_batch_step(mesh_axis: str, mesh, scenes, cfg: PhysicsConfig,
                       n_steps: int = 1):
    """Multi-chip variant: the scene batch is sharded over ``mesh_axis`` of
    ``mesh`` (jax.sharding.Mesh). Returns (stepped batch, global ACTIVITY
    scalar Σ active·(|v|²+|ω|²) psum'd over devices — a mass-free motion
    metric for idle/convergence monitoring, NOT kinetic energy)."""
    from jax import shard_map

    def per_shard(sc):
        out = batch_step(sc, cfg, n_steps)
        activity = jnp.sum(
            jnp.where(
                out.bodies.active[..., None],
                out.bodies.v**2 + out.bodies.w**2,
                0.0,
            )
        )
        return out, jax.lax.psum(activity, mesh_axis)

    specs = jax.tree_util.tree_map(lambda _: P(mesh_axis), scenes)
    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, P()),
    )(scenes)
