#!/usr/bin/env python
"""Per-stage TPU timing of do_fracture on the EVOLVED interactive-frame
state (bench config 4 after N warm frames — the piece pool is full there,
and the Pallas folds' data-dependent block skips make cost depend on how
many jobs are really alive; the fresh initial-decomposition profile in
profile_impact.py under-measures by ~2x).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_iframe_frac.py
Env: STAGES=1,2,3,4,5,99  WARM_FRAMES=8
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REP = 8


def timeit(fn, *args, warmup=2, iters=5):
    def fence(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))

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
    from surtr_tpu.scene import Scene, _bake_pieces, interactive_frame

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
    cfg = sc.cfg  # post convex-model dispatch
    fcfg = sc.cfg.fracture  # post convex-model dispatch (exact_caps off)
    if os.environ.get("SURTR_MESH_POOL") == "0":
        import dataclasses

        fcfg = dataclasses.replace(fcfg, mesh_pair_pool=False)
    origin = jnp.asarray([0.0, 10.0, 0.0])
    direction = jnp.asarray([0.0, -1.0, 0.0])
    eye = jnp.asarray([8.0, 6.0, 8.0], jnp.float32)
    target = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)

    # Evolve the bench state: WARM_FRAMES fused frames (same as bench REP).
    warm = int(os.environ.get("WARM_FRAMES", "8"))
    pieces, phys, x0 = sc.pieces, sc.phys, sc._x0
    for _ in range(warm):
        pieces, phys, x0, _img, _m = interactive_frame(
            pieces, phys, x0, sc.ctx, origin, direction, eye, target, cfg=cfg
        )
    pieces = jax.tree_util.tree_map(jax.block_until_ready, pieces)
    print(
        f"evolved state: {int(np.sum(np.asarray(pieces.valid)))} valid pieces,"
        f" {int(np.asarray(pieces.num_groups()))} groups",
        flush=True,
    )

    # Aim the ray at the biggest surviving piece so the event actually
    # fractures something (after 8 frames the debris has fallen away from
    # the scripted ray; a miss measures only the static glue).
    from surtr_tpu.ops.moments import moments as _moments

    vols, cents = _moments(pieces.convex)
    big = int(np.asarray(jnp.argmax(jnp.where(pieces.valid, vols, -1.0))))
    aim = np.asarray(cents)[big]
    origin = jnp.asarray([aim[0], aim[1] + 10.0, aim[2]], jnp.float32)
    direction = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)

    # The frame's own pre-fracture glue, frozen once.
    d = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
    pidx, t = raycast(phys, origin, d)
    hit = pidx >= 0
    impact = origin + d * (t + fcfg.target_adder)
    B = phys.B
    ov = sphere_overlap(phys, impact, fcfg.impact_radius / 2.0)
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
        convex=baked.convex, mesh=baked.mesh, mesh_valid=baked.mesh_valid,
        valid=baked.valid, group=baked.group,
        tag=jnp.where(baked.valid, baked.group, -1),
    )
    tmask = (
        baked.valid & (baked.group >= 0) & bt[jnp.clip(baked.group, 0, B - 1)]
    )
    baked = jax.tree_util.tree_map(jax.block_until_ready, baked)
    print(f"targets: {int(np.sum(np.asarray(tmask)))} pieces", flush=True)

    names = {
        1: "1 select+conv grid",
        2: "2 +mesh clip",
        3: "3 +islands",
        45: "f1 occupancy",
        46: "f2 +pool+refit planes",
        47: "f3 +refit clip fold",
        4: "4 +finish (full)",
        5: "5 +merge/pack",
        99: "6 full (+group split)",
    }
    stages = [int(s) for s in os.environ.get(
        "STAGES", "1,2,3,4,5,99").split(",")]
    prev = 0.0
    for st in stages:

        @jax.jit
        def run_many(p, tm, _st=st):
            def body(c, _):
                out, met = do_fracture(
                    p, sc.ctx, impact + c * 0, tm, fcfg,
                    partial=fcfg.partial_fracture, profile_stage=_st,
                )
                if _st < 99:
                    s = out.astype(jnp.float32)
                else:
                    s = jnp.float32(0)
                    for leaf in jax.tree_util.tree_leaves(out):
                        s = s + jnp.sum(leaf).astype(jnp.float32)
                    s = s + met["total_volume"]
                return c + s, None

            return jax.lax.scan(body, jnp.float32(0), None, length=REP)[0]

        t0 = time.time()
        ms = timeit(run_many, baked, tmask)
        print(
            f"{names[st]:24s} cum={ms:8.2f} ms  delta={ms - prev:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
