#!/usr/bin/env python
"""Per-stage TPU timing of the fused interactive frame (bench config 4).

Cumulative truncation: stage cost = delta between adjacent rows. Fencing
matches bench.py (REP-scanned, scalar fetch). Run from repo root with the
axon PYTHONPATH intact:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_iframe.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REP = 8


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) / REP


def main():
    from surtr_tpu.config import (
        FractureConfig, PhysicsConfig, RenderConfig, SceneConfig,
    )
    from surtr_tpu.fracture.pipeline import do_fracture
    from surtr_tpu.fracture.types import PieceSet
    from surtr_tpu.physics.queries import raycast, sphere_overlap
    from surtr_tpu.physics.scene import build_scene
    from surtr_tpu.physics.step import physics_step
    from surtr_tpu.scene import (
        Scene, _bake_pieces, _transfer_velocities, render_pieces_frame,
    )

    cfg = SceneConfig(
        fracture=FractureConfig(
            initial_decompose_cell_cnt=64,
            max_pieces=256,
            max_active_pieces=32,
            max_piece_tris=64,
            max_mesh_tris=512,
            partial_pattern_cell_cnt=128,
            general_pattern_cell_cnt=64,
            voronoi_neighbors=48,
        ),
        physics=PhysicsConfig(),
        render=RenderConfig(width=512, height=512, shadow_size=512),
    )
    sc = Scene("cube", cfg)
    cfg = sc.cfg  # post convex-model dispatch (exact_caps off for the cube)
    origin = jnp.asarray([0.0, 10.0, 0.0])
    direction = jnp.asarray([0.0, -1.0, 0.0])
    eye = jnp.asarray([8.0, 6.0, 8.0], jnp.float32)
    target = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    fcfg, pcfg = cfg.fracture, cfg.physics

    def allsum(*trees):
        """Fence EVERY leaf — truncating to one field lets XLA dead-code-
        eliminate the rest of the stage and pollute the next delta."""
        tot = jnp.float32(0)
        for t in trees:
            for leaf in jax.tree_util.tree_leaves(t):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
        return tot

    def stage_fn(stage):
        def one(pieces, phys, x0, c):
            d = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
            pidx, t = raycast(phys, origin + c * 0, d)
            hit = pidx >= 0
            impact = origin + d * (t + fcfg.target_adder)
            B = phys.B
            if fcfg.radial_mode:
                ov = sphere_overlap(phys, impact, fcfg.impact_radius / 2.0)
            else:
                ov = jnp.arange(phys.Np) == jnp.clip(pidx, 0, phys.Np - 1)
            own_ok = phys.piece_owner >= 0
            bt = (
                jax.ops.segment_max(
                    (ov & own_ok).astype(jnp.int32),
                    jnp.clip(phys.piece_owner, 0, B - 1),
                    num_segments=B,
                )
                > 0
            )
            bt = bt & (phys.bodies.inv_mass > 0) & hit
            baked = _bake_pieces(pieces, phys, x0)
            baked = PieceSet(
                convex=baked.convex, mesh=baked.mesh,
                mesh_valid=baked.mesh_valid, valid=baked.valid,
                group=baked.group,
                tag=jnp.where(baked.valid, baked.group, -1),
            )
            if stage == 0:
                return allsum(baked)
            tmask = (
                baked.valid & (baked.group >= 0)
                & bt[jnp.clip(baked.group, 0, B - 1)]
            )
            pieces2, met = do_fracture(
                baked, sc.ctx, impact, tmask, fcfg,
                partial=fcfg.partial_fracture,
            )
            if stage == 1:
                return allsum(pieces2)
            phys2 = build_scene(pieces2, pcfg)
            phys2 = _transfer_velocities(
                phys2, phys, pieces2.group, pieces2.tag, pieces2.valid
            )
            if stage == 2:
                return allsum(phys2)
            phys3 = physics_step(phys2, pcfg)
            if stage == 3:
                return allsum(phys3, pieces2)
            world = _bake_pieces(pieces2, phys3, phys2.bodies.x)
            if stage == 4:
                return allsum(world, phys3)
            img = render_pieces_frame(
                world, jnp.asarray(True), eye, target,
                jnp.asarray([-0.4, -1.0, -0.3], jnp.float32),
                rcfg=cfg.render, ground_y=pcfg.ground_y,
            )
            return jnp.sum(img[::64, ::64])

        @jax.jit
        def run(pieces, phys, x0):
            def body(c, _):
                return c + one(pieces, phys, x0, c), None
            return jax.lax.scan(body, jnp.float32(0), None, length=REP)[0]

        return run

    names = ["raycast+bake", "+do_fracture", "+rebuild+xfer",
             "+physics_step", "+bake_world", "+render (full)"]
    prev = 0.0
    print(f"backend={jax.default_backend()}", flush=True)
    for s, name in enumerate(names):
        ms = timeit(stage_fn(s), sc.pieces, sc.phys, sc._x0)
        print(f"stage {s} {name:16s} cum {ms:7.2f} ms  (+{ms - prev:6.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
