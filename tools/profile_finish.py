#!/usr/bin/env python
"""Sub-stage TPU timing of _finish_pieces (the decomp refit/caps tail).

Each stage returns only its own outputs, so earlier stages it does not
depend on are dead-coded — deltas between rows are therefore indicative,
not exact (same discipline as profile_decomp.py).
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

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pattern import uniform_seeds
from surtr_tpu.fracture.pipeline import (
    _cell_plane_sets,
    _match_cut_faces,
    _append_tris,
    cut_face_tris,
    refit_planes,
)
from surtr_tpu.io.models import get_model
from surtr_tpu.ops.clip import clip_poly_planes
from surtr_tpu.ops.clip_pallas import clip_planes_batch
from surtr_tpu.ops.hull import ich
from surtr_tpu.ops.kdop import kdop_planes
from surtr_tpu.ops.mesh_clip import clip_trisoup, point_in_mesh
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import ConvexPoly, scale_poly, translate_poly, unit_cube

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
    Tp = cfg.max_piece_tris

    v, f = get_model("cube")
    verts = jnp.asarray(v)
    vmask = jnp.ones(len(v), bool)
    tri_corners = jnp.asarray(v[f])
    tmask = jnp.ones(len(f), bool)
    key = jax.random.PRNGKey(46354)
    keys = jax.random.split(key, REP)

    # Precompute the inputs once (off the clock): conv/mtris at the point
    # where _finish_pieces starts.
    @jax.jit
    def setup(key):
        h = ich(verts, vmask, limit=cfg.ich_include_point_limit)
        big = jnp.asarray(BIG, verts.dtype)
        vm = vmask[:, None]
        bb_min = jnp.min(jnp.where(vm, verts, big), axis=0)
        bb_max = jnp.max(jnp.where(vm, verts, -big), axis=0)
        bb_center = (bb_min + bb_max) * 0.5
        extent = bb_max - bb_min
        mas_ = jnp.max(extent)
        planes, pm = kdop_planes(
            verts, vmask, h["normals"], h["face_valid"],
            gap=mas_ / cfg.ach_plane_gap_inverse,
        )
        ach = translate_poly(
            scale_poly(unit_cube(F=F, S=S, dtype=verts.dtype), extent * 2.0),
            bb_center,
        )
        ach = clip_poly_planes(ach, planes, pm)
        seeds = uniform_seeds(key, C)
        kN = min(cfg.voronoi_neighbors, C - 1)
        cell_planes, cell_pmask = _cell_plane_sets(seeds, kN, extent, bb_center)
        ach_b = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (C,) + a.shape), ach
        )
        conv = clip_planes_batch(ach_b, cell_planes, cell_pmask)
        mtris, mmask, _ = jax.vmap(
            lambda pl, pm_: clip_trisoup(tri_corners, tmask, pl, pm_, max_out=Tp)
        )(cell_planes, cell_pmask)
        return conv, mtris, mmask, cell_planes, cell_pmask

    conv, mtris, mmask, cell_planes, cell_pmask = setup(key)
    mas = 2.0
    solid_corners = jnp.broadcast_to(tri_corners[None], (C,) + tri_corners.shape)
    solid_mask = jnp.broadcast_to(tmask[None], (C,) + tmask.shape)
    inputs = jax.device_put((conv, mtris, mmask, cell_planes, cell_pmask))
    conv, mtris, mmask, cut_planes, cut_mask = inputs

    def stage(upto):
        def run(x):
            cv = ConvexPoly(conv.face_verts + x * 0, conv.n_verts, conv.planes)
            # a) occupancy
            has_tris = jnp.any(mmask, axis=-1)
            _, cent = moments(cv)
            inside = jax.vmap(
                lambda c, t, m: point_in_mesh(c[None], t, m)[0]
            )(cent, solid_corners, solid_mask)
            cand_valid = ~cv.is_empty() & (has_tris | inside)
            if upto == 0:
                return cand_valid

            # b) pool
            def pool_one(cv1, tris, tmask_, planes_, pmask_):
                cut_sel = _match_cut_faces(cv1, planes_, pmask_, mas)
                cap_v = cv1.face_verts.reshape(-1, 3)
                cap_m = (cv1.slot_mask() & cut_sel[:, None]).reshape(-1)
                surf_v = tris.reshape(-1, 3)
                surf_m = jnp.repeat(tmask_, 3)
                return (
                    jnp.concatenate([surf_v, cap_v]),
                    jnp.concatenate([surf_m, cap_m]),
                )

            pool, pool_m = jax.vmap(pool_one)(cv, mtris, mmask, cut_planes, cut_mask)
            if upto == 1:
                return pool

            # c) refit planes (ich + kdop)
            slabs, slab_m = jax.vmap(
                lambda v_, m_: refit_planes(v_, m_, cfg.refitting_point_limit)
            )(pool, pool_m)
            if upto == 2:
                return slabs

            # d) the slab fold
            conv2 = clip_planes_batch(cv, slabs, slab_m)
            if upto == 3:
                return conv2.n_verts

            # e) caps
            def caps_one(refit, tris, tmask_, planes_, pmask_):
                cut2 = _match_cut_faces(refit, planes_, pmask_, mas)
                cap_rows, cap_counts = cut_face_tris(refit, cut2)
                tris2, tmask2, _ = _append_tris(
                    tris, jnp.sum(tmask_), cap_rows, cap_counts
                )
                return tris2, tmask2

            mtris2, mmask2 = jax.vmap(caps_one)(
                conv2, mtris, mmask, cut_planes, cut_mask
            )
            return mmask2

        @jax.jit
        def run_many(ks):
            def body(c, k):
                out = run(k[0])
                return c + jnp.sum(out.astype(jnp.float32)), None

            return jax.lax.scan(body, jnp.float32(0), ks)[0]

        return run_many

    names = [
        "a occupancy",
        "b pool",
        "c refit_planes(ich+kdop)",
        "d slab fold",
        "e caps",
    ]
    stages = list(range(5))
    only = os.environ.get("STAGES")
    if only:
        stages = [int(s) for s in only.split(",")]
    prev = 0.0
    for i in stages:
        t0 = time.time()
        ms = timeit(stage(i), keys)
        print(
            f"{names[i]:28s} cum={ms:8.2f} ms  delta={ms - prev:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
