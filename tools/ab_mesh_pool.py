#!/usr/bin/env python
"""TPU A/B of do_fracture's mesh clip: packed pair pool vs vmapped path.

Checks piece validity/area agreement on the evolved iframe state and times
the full do_fracture either way.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_mesh_pool.py
"""

from __future__ import annotations

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REP = 8


def timeit(fn, *args, warmup=2, iters=5):
    def fence(x):
        return float(
            jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32)
        )

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
    from surtr_tpu.ops.moments import moments
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
    origin = jnp.asarray([0.0, 10.0, 0.0])
    direction = jnp.asarray([0.0, -1.0, 0.0])
    eye = jnp.asarray([8.0, 6.0, 8.0], jnp.float32)
    target = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    pieces, phys, x0 = sc.pieces, sc.phys, sc._x0
    for _ in range(4):
        pieces, phys, x0, _img, _m = interactive_frame(
            pieces, phys, x0, sc.ctx, origin, direction, eye, target, cfg=cfg
        )
    fcfg = sc.cfg.fracture

    vols, cents = moments(pieces.convex)
    big = int(np.asarray(jnp.argmax(jnp.where(pieces.valid, vols, -1.0))))
    aim = np.asarray(cents)[big]
    o2 = jnp.asarray([aim[0], aim[1] + 10.0, aim[2]], jnp.float32)
    d = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    pidx, t = raycast(phys, o2, d)
    impact = o2 + d * (t + fcfg.target_adder)
    B = phys.B
    ov = sphere_overlap(phys, impact, fcfg.impact_radius / 2.0)
    bt = (
        jax.ops.segment_max(
            (ov & (phys.piece_owner >= 0)).astype(jnp.int32),
            jnp.clip(phys.piece_owner, 0, B - 1), num_segments=B,
        )
        > 0
    ) & (phys.bodies.inv_mass > 0) & (pidx >= 0)
    baked = _bake_pieces(pieces, phys, x0)
    baked = PieceSet(
        convex=baked.convex, mesh=baked.mesh, mesh_valid=baked.mesh_valid,
        valid=baked.valid, group=baked.group,
        tag=jnp.where(baked.valid, baked.group, -1),
    )
    tmask = (
        baked.valid & (baked.group >= 0) & bt[jnp.clip(baked.group, 0, B - 1)]
    )
    print(f"targets: {int(np.sum(np.asarray(tmask)))}", flush=True)

    outs = {}
    for pool in (True, False):
        fcfg2 = dataclasses.replace(fcfg, mesh_pair_pool=pool)

        @jax.jit
        def run(p, tm, _f=fcfg2):
            def body(c, _):
                out, met = do_fracture(
                    p, sc.ctx, impact + c * 0, tm, _f,
                    partial=_f.partial_fracture,
                )
                s = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    s = s + jnp.sum(leaf).astype(jnp.float32)
                return c + s * 0, out

            _, outs_ = jax.lax.scan(body, jnp.float32(0), None, length=REP)
            return jax.tree_util.tree_map(lambda a: a[0], outs_)

        ms = timeit(run, baked, tmask)
        res = run(baked, tmask)
        outs[pool] = res
        nval = int(np.sum(np.asarray(res.valid)))
        area = float(
            np.sum(
                0.5
                * np.linalg.norm(
                    np.cross(
                        np.asarray(res.mesh)[:, :, 1]
                        - np.asarray(res.mesh)[:, :, 0],
                        np.asarray(res.mesh)[:, :, 2]
                        - np.asarray(res.mesh)[:, :, 0],
                    ),
                    axis=-1,
                )
                * np.asarray(res.mesh_valid)
            )
        )
        vol = float(
            np.sum(
                np.asarray(moments(res.convex)[0]) * np.asarray(res.valid)
            )
        )
        print(
            f"mesh_pair_pool={pool}: do_fracture {ms:6.2f} ms | "
            f"valid={nval} area={area:.4f} vol={vol:.5f}",
            flush=True,
        )

    a, b = outs[True], outs[False]
    va = int(np.sum(np.asarray(a.valid)))
    vb = int(np.sum(np.asarray(b.valid)))
    print(f"valid diff: {abs(va - vb)}", flush=True)


if __name__ == "__main__":
    main()
