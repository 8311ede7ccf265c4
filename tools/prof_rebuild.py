#!/usr/bin/env python
"""Isolate the cost of build_scene + _transfer_velocities at the fused
interactive-frame shapes (P=256 pieces, F=32, S=16, Vh=64, Ne=3) — the
rebuild stage measured +7.04 ms in tools/profile_iframe.py (round 5).

Each phase is timed as its own scanned, fenced program (REP=16); phases are
ISOLATED (not cumulative) — ROADMAP warns prefix deltas carry ±0.5 ms error.
  PYTHONPATH=/root/.axon_site:/root/repo python tools/prof_rebuild.py
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REP = 16


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


def scanned(fn):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = fn(*args, c)
            # Fence EVERY float leaf — fencing only the first leaf lets XLA
            # dead-code-eliminate the rest of the computation.
            tot = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
            return c + tot, None

        return jax.lax.scan(body, jnp.float32(0), None, length=REP)[0]

    return run


def main():
    from surtr_tpu.config import FractureConfig, PhysicsConfig, SceneConfig
    from surtr_tpu.ops.moments import inertia
    from surtr_tpu.physics.scene import (
        _dedup_verts, _edge_dirs, build_scene,
    )
    from surtr_tpu.scene import Scene, _transfer_velocities

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
    )
    sc = Scene("cube", cfg)
    sc.fire_impact((0, 10, 0), (0, -1, 0))
    pieces = sc.pieces
    pcfg = cfg.physics
    P = pieces.P
    Vh = pcfg.max_hull_verts
    print(f"backend={jax.default_backend()} P={P} "
          f"F={pieces.convex.planes.shape[1]} Vh={Vh}", flush=True)

    phys = build_scene(pieces, pcfg)
    old = sc.phys

    rows = []

    def one(name, fn):
        ms = timeit(scanned(fn), warmup=2)
        rows.append((name, ms))
        print(f"{name:28s} {ms:7.3f} ms", flush=True)

    one("full build_scene", lambda c: build_scene(
        jax.tree_util.tree_map(
            lambda a: a + c * 0 if a.dtype.kind == "f" else a, pieces
        ), pcfg,
    ))
    one("inertia+segments", lambda c: inertia(
        jax.tree_util.tree_map(
            lambda a: a + c * 0 if a.dtype.kind == "f" else a, pieces.convex
        ), density=pcfg.density,
    ))

    fv = pieces.convex.face_verts
    sm = pieces.convex.slot_mask()
    nv = pieces.convex.n_verts

    one("dedup_verts (vmap)", lambda c: jax.vmap(
        lambda f, s: _dedup_verts(f, s, Vh)
    )(fv + c * 0, sm))
    one("edge_dirs (vmap)", lambda c: jax.vmap(
        lambda f, n: _edge_dirs(f, n, pcfg.max_edge_dirs)
    )(fv + c * 0, nv))

    def sort_pack(c):
        owner_raw = jnp.where(pieces.valid, pieces.group, -1).astype(jnp.int32)
        key = jnp.where(owner_raw >= 0, owner_raw, P)
        order = jnp.argsort(key)
        payload = jnp.concatenate(
            [fv.reshape(P, -1) + c * 0, sm.reshape(P, -1).astype(jnp.float32)],
            axis=1,
        )[order]
        return payload

    one("owner sort + payload gather", sort_pack)
    one("transfer_velocities", lambda c: _transfer_velocities(
        jax.tree_util.tree_map(lambda a: a, phys), old,
        pieces.group, pieces.tag, pieces.valid,
    ))


if __name__ == "__main__":
    main()
