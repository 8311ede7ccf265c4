#!/usr/bin/env python
"""Isolate split_groups_by_contact sub-costs on the evolved iframe state.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/prof_split_groups.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np

REP = 16


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


def scan_rep(fn):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = fn(*args, salt=c)
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(leaf).astype(jnp.float32)
            return c + s, None

        return jax.lax.scan(body, jnp.float32(0), None, length=REP)[0]

    return run


def main():
    from surtr_tpu.config import (
        FractureConfig, PhysicsConfig, RenderConfig, SceneConfig,
    )
    from surtr_tpu.fracture.pipeline import (
        _dense_renumber, split_groups_by_contact,
    )
    from surtr_tpu.ops.labels import adjacency_components
    from surtr_tpu.scene import Scene, interactive_frame

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
    for _ in range(8):
        pieces, phys, x0, _img, _m = interactive_frame(
            pieces, phys, x0, sc.ctx, origin, direction, eye, target, cfg=cfg
        )
    pieces = jax.tree_util.tree_map(jax.block_until_ready, pieces)
    mas = sc.ctx.max_axis_scale
    eps = 1e-3 * mas
    print(f"pieces valid={int(np.sum(np.asarray(pieces.valid)))}", flush=True)

    def full(p, salt, exact=True):
        p2 = jax.tree_util.tree_map(
            lambda a: a + salt * 0 if a.dtype.kind == "f" else a, p
        )
        return split_groups_by_contact(p2, eps, exact=exact)[0]

    ms = timeit(scan_rep(functools.partial(full, exact=True)), pieces)
    print(f"full exact=True       {ms:7.3f} ms", flush=True)
    ms = timeit(scan_rep(functools.partial(full, exact=False)), pieces)
    print(f"full exact=False      {ms:7.3f} ms", flush=True)

    # adjacency_components alone on a same-size random adjacency.
    P = pieces.P
    key = jax.random.PRNGKey(0)
    adj = jax.random.uniform(key, (P, P)) < 0.02

    def comp_only(a, v, salt):
        return adjacency_components(a ^ (salt > 1e9), v)

    ms = timeit(scan_rep(comp_only), adj, pieces.valid)
    print(f"adjacency_components  {ms:7.3f} ms", flush=True)

    def renum_only(g, v, salt):
        return _dense_renumber(g + (salt * 0).astype(jnp.int32), v)

    ms = timeit(scan_rep(renum_only), pieces.group, pieces.valid)
    print(f"dense_renumber        {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
