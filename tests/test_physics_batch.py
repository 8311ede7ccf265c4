"""Batched multi-scene physics: per-scene equality and sharded equality
(SURVEY §2.3 scaling axis extended to dynamics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from surtr_tpu.config import PhysicsConfig
from surtr_tpu.fracture.types import PieceSet
from surtr_tpu.physics.batch import batch_step, sharded_batch_step
from surtr_tpu.physics.scene import build_scene
from surtr_tpu.physics.step import physics_step
from surtr_tpu.types import translate_poly, unit_cube

# max_hull_verts=16: every hull in this file is a unit cube (8 verts) —
# the default 64 pads the narrowphase tensors 8x for nothing on CPU.
PCFG = PhysicsConfig(broadphase_block=64, max_hull_verts=16)


def _scene(dx):
    offs = [[dx, -1.45, 0.0], [dx, -0.4, 0.0]]
    polys = [
        translate_poly(unit_cube(), jnp.asarray(o, jnp.float32)) for o in offs
    ]
    conv = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *polys)
    pieces = PieceSet(
        conv,
        jnp.zeros((2, 4, 3, 3)),
        jnp.zeros((2, 4), bool),
        jnp.ones((2,), bool),
        jnp.asarray([0, 1], jnp.int32),
        jnp.full((2,), -1, jnp.int32),
    )
    return build_scene(pieces, PCFG)


def _batch(M=8):
    scenes = [_scene(0.1 * i) for i in range(M)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *scenes), scenes


def test_batch_step_matches_per_scene():
    batch, scenes = _batch(4)
    out = batch_step(batch, PCFG, n_steps=30)
    for i, sc in enumerate(scenes):
        ref = sc
        step = jax.jit(lambda s: physics_step(s, PCFG))
        for _ in range(30):
            ref = step(ref)
        np.testing.assert_allclose(
            np.asarray(out.bodies.x[i]), np.asarray(ref.bodies.x), atol=1e-6
        )


def test_sharded_batch_step_matches_unsharded():
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("scene",))
    batch, _ = _batch(8)
    want = batch_step(batch, PCFG, n_steps=10)
    got, act = sharded_batch_step("scene", mesh, batch, PCFG, n_steps=10)
    np.testing.assert_allclose(
        np.asarray(got.bodies.x), np.asarray(want.bodies.x), atol=1e-6
    )
    act_want = float(
        jnp.sum(
            jnp.where(
                want.bodies.active[..., None],
                want.bodies.v**2 + want.bodies.w**2,
                0.0,
            )
        )
    )
    assert np.isclose(float(act), act_want, rtol=1e-5, atol=1e-6)
