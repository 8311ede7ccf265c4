#!/usr/bin/env python
"""Per-stage TPU timing of the 10k-fragment physics step (bench config 3).

Uses physics_step(profile_stage=N) truncations; stage cost = delta between
adjacent rows. Fencing/amortization discipline matches bench.py.
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SURTR_JAX_CACHE", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REP = 8


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, warmup=2, iters=6):
    for _ in range(warmup):
        fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) / REP


def make_scene(n=10_000):
    from surtr_tpu.config import PhysicsConfig
    from surtr_tpu.fracture.types import PieceSet
    from surtr_tpu.physics.scene import build_scene
    from surtr_tpu.types import ConvexPoly, unit_cube

    pcfg = PhysicsConfig(
        single_piece_bodies=True,
        max_hull_verts=32,
        pallas_narrowphase=os.environ.get("SURTR_NP", "0") != "0",
        broadphase=os.environ.get("SURTR_BP", "auto"),
    )
    side = int(round(n ** (1 / 3)))
    while side * side * side < n:
        side += 1
    idx = np.arange(side**3)[:n]
    xs = np.stack(
        [idx % side, (idx // side) % side, idx // (side * side)], axis=1
    ).astype(np.float32)
    offsets = xs * 1.02 + np.array([-side / 2, -1.45, -side / 2])
    cube = unit_cube(F=8, S=8)
    conv = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), cube
    )
    fv = conv.face_verts + jnp.asarray(offsets)[:, None, None, :]
    d = conv.planes[..., 3:4] - jnp.sum(
        conv.planes[..., :3] * jnp.asarray(offsets)[:, None, :], -1, keepdims=True
    )
    conv = ConvexPoly(fv, conv.n_verts, jnp.concatenate([conv.planes[..., :3], d], -1))
    pieces = PieceSet(
        convex=conv,
        mesh=jnp.zeros((n, 1, 3, 3)),
        mesh_valid=jnp.zeros((n, 1), bool),
        valid=jnp.ones((n,), bool),
        group=jnp.arange(n, dtype=jnp.int32),
        tag=jnp.full((n,), -1, jnp.int32),
    )
    return build_scene(pieces, pcfg, max_bodies=n), pcfg


def main():
    from surtr_tpu.physics.step import physics_step

    scene, pcfg = make_scene()

    names = {
        1: "1 transforms+aabb",
        2: "2 +broadphase",
        3: "3 +narrowphase",
        4: "4 +solver",
        35: "3b +contact prep",
        99: "5 full step",
    }
    stages = [1, 2, 3, 35, 4, 99]
    only = os.environ.get("STAGES")
    if only:
        stages = [int(s) for s in only.split(",")]
    prev = 0.0
    for st in stages:

        @jax.jit
        def run(s, _st=st):
            out = jax.lax.scan(
                lambda c, _: (physics_step(c, pcfg, profile_stage=_st), None),
                s, None, length=REP,
            )[0]
            return out.bodies.x

        t0 = time.time()
        ms = timeit(run, scene)
        print(
            f"{names[st]:22s} cum={ms:8.2f} ms  delta={ms - prev:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
