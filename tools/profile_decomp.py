#!/usr/bin/env python
"""Per-stage TPU timing of the 1k-seed decomposition (bench config 2 core).

Times cumulative prefixes of prepare_fracture's stages so stage cost =
difference of adjacent rows. Uses the same fencing/amortization discipline as
bench.py (the axon tunnel's block_until_ready does not fence).
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SURTR_JAX_CACHE", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pattern import uniform_seeds
from surtr_tpu.fracture.pipeline import (
    _cell_plane_sets,
    _finish_pieces,
    _pack_candidates,
)
from surtr_tpu.io.models import get_model, sphere_point_cloud
from surtr_tpu.ops.clip import clip_poly_planes
from surtr_tpu.ops.hull import ich
from surtr_tpu.ops.kdop import kdop_planes
from surtr_tpu.ops.mesh_clip import clip_trisoup
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import scale_poly, translate_poly, unit_cube

BIG = 3.4e38
REP = 4


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
    cfg = FractureConfig(
        initial_decompose_cell_cnt=1024,
        max_pieces=1024,
        max_faces=32,
        max_face_verts=16,
        max_piece_tris=64,
        voronoi_neighbors=48,
        partial_pattern_cell_cnt=8,
        general_pattern_cell_cnt=8,
    )
    F, S = cfg.max_faces, cfg.max_face_verts
    C = cfg.initial_decompose_cell_cnt
    P = cfg.max_pieces
    Tp = cfg.max_piece_tris

    v, f = get_model("cube")
    verts = jnp.asarray(v)
    vmask = jnp.ones(len(v), bool)
    tri_corners = jnp.asarray(v[f])
    tmask = jnp.ones(len(f), bool)
    key = jax.random.PRNGKey(46354)
    keys = jax.random.split(key, REP)

    def stage_prefix(upto):
        def run(k):
            h = ich(verts, vmask, limit=cfg.ich_include_point_limit)
            big = jnp.asarray(BIG, verts.dtype)
            vm = vmask[:, None]
            bb_min = jnp.min(jnp.where(vm, verts, big), axis=0)
            bb_max = jnp.max(jnp.where(vm, verts, -big), axis=0)
            bb_center = (bb_min + bb_max) * 0.5
            extent = bb_max - bb_min
            mas = jnp.max(extent)
            planes, pm = kdop_planes(
                verts, vmask, h["normals"], h["face_valid"],
                gap=mas / cfg.ach_plane_gap_inverse,
            )
            ach = translate_poly(
                scale_poly(unit_cube(F=F, S=S, dtype=verts.dtype), extent * 2.0),
                bb_center,
            )
            ach = clip_poly_planes(ach, planes, pm)
            if upto == 0:
                return ach.n_verts
            seeds = uniform_seeds(k, C)
            kN = min(cfg.voronoi_neighbors, C - 1)
            cell_planes, cell_pmask = _cell_plane_sets(seeds, kN, extent, bb_center)
            if upto == 1:
                return cell_planes
            from surtr_tpu.ops.clip_pallas import clip_planes_batch

            ach_b = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a[None], (C,) + a.shape), ach
            )
            conv = clip_planes_batch(ach_b, cell_planes, cell_pmask)
            if upto == 2:
                return conv.n_verts
            mtris, mmask, mdrop = jax.vmap(
                lambda pl, pm_: clip_trisoup(tri_corners, tmask, pl, pm_, max_out=Tp)
            )(cell_planes, cell_pmask)
            if upto == 3:
                return mmask
            out = _finish_pieces(
                conv, mtris, mmask, cell_planes, cell_pmask,
                jnp.broadcast_to(tri_corners[None], (C,) + tri_corners.shape),
                jnp.broadcast_to(tmask[None], (C,) + tmask.shape),
                mas, cfg,
            )
            conv2, mtris2, mmask2, cand_valid = out
            if upto == 4:
                return conv2.n_verts
            vol, _ = moments(conv2)
            pieces = _pack_candidates(
                conv2, mtris2, mmask2, cand_valid,
                jnp.zeros((C,), jnp.int32), jnp.full((C,), -1, jnp.int32),
                vol, P, Tp, F, S,
            )
            return pieces.valid

        @jax.jit
        def run_many(ks):
            def body(c, k):
                out = run(k)
                return c + jnp.sum(out.astype(jnp.float32)), None

            return jax.lax.scan(body, jnp.float32(0), ks)[0]

        return run_many

    names = [
        "0 ich+kdop+ach",
        "1 +cell_plane_sets",
        "2 +conv clip fold",
        "3 +mesh clip",
        "4 +finish(refit/caps)",
        "5 +pack (full)",
    ]
    stages = list(range(6))
    only = os.environ.get("STAGES")
    if only:
        stages = [int(s) for s in only.split(",")]
    prev = 0.0
    for i in stages:
        t0 = time.time()
        ms = timeit(stage_prefix(i), keys)
        print(
            f"{names[i]:26s} cum={ms:8.2f} ms  delta={ms - prev:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
