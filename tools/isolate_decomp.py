#!/usr/bin/env python
"""Isolated per-stage TPU timing of the 1k-seed decomposition.

Unlike profile_decomp.py (cumulative prefixes, DCE-noisy), each stage here
is timed ALONE on its real intermediate inputs (computed once up front).
A null scan measures the dispatch floor so device cost ≈ raw − floor.
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
    _finish_pieces,
    _pack_candidates,
    _two_pass_cell_clip,
)
from surtr_tpu.io.models import get_model
from surtr_tpu.ops.clip import clip_poly_planes
from surtr_tpu.ops.clip_pallas import clip_planes_batch
from surtr_tpu.ops.hull import ich
from surtr_tpu.ops.kdop import kdop_planes
from surtr_tpu.ops.mesh_clip import clip_trisoup
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import scale_poly, translate_poly, unit_cube

BIG = 3.4e38
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


def scanned(stage):
    """Time `stage(i)` REP times in one dispatch; fence a scalar."""

    @jax.jit
    def run(x0):
        def body(c, i):
            out = stage(i)
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None

        return jax.lax.scan(body, x0, jnp.arange(REP))[0]

    return run


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

    v, f = get_model(os.environ.get("SURTR_MODEL", "cube"))
    verts = jnp.asarray(v)
    vmask = jnp.ones(len(v), bool)
    tri_corners = jnp.asarray(v[f])
    tmask = jnp.ones(len(f), bool)
    key = jax.random.PRNGKey(46354)

    # ---- compute real intermediates once (device constants for stages).
    @jax.jit
    def upfront(k):
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
        seeds = uniform_seeds(k, C)
        kN = min(cfg.voronoi_neighbors, C - 1)
        cell_planes, cell_pmask = _cell_plane_sets(seeds, kN, extent, bb_center)
        ach_b = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (C,) + a.shape), ach
        )
        conv = clip_planes_batch(ach_b, cell_planes, cell_pmask)
        mtris, mmask, _ = jax.vmap(
            lambda pl_, pm_: clip_trisoup(tri_corners, tmask, pl_, pm_, max_out=Tp)
        )(cell_planes, cell_pmask)
        return dict(
            ach=ach, mas=mas, extent=extent, bb_center=bb_center,
            seeds=seeds, cell_planes=cell_planes, cell_pmask=cell_pmask,
            conv=conv, mtris=mtris, mmask=mmask,
        )

    iv = jax.block_until_ready(upfront(key))
    kN = min(cfg.voronoi_neighbors, C - 1)
    keys = jax.random.split(key, REP)
    tris_b = jnp.broadcast_to(tri_corners[None], (C,) + tri_corners.shape)
    tmask_b = jnp.broadcast_to(tmask[None], (C,) + tmask.shape)

    # Null scan = dispatch floor.
    floor = timeit(scanned(lambda i: i.astype(jnp.float32)), jnp.float32(0))
    print(f"dispatch floor            {floor:8.2f} ms/rep", flush=True)

    def vary(a, i):
        """Perturb-by-zero every float leaf so LICM can't hoist the stage
        out of the REP scan (the perturbation is identity at runtime)."""
        v_ = lambda x: (
            x + i.astype(x.dtype) * 0
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x
        )
        return jax.tree_util.tree_map(v_, a)

    stages = {
        # Matches production: the ACH clip goes through the backend-
        # dispatched batch kernel (Pallas on TPU), NOT the XLA scan fold
        # (clip_poly_planes measured 2.6 ms vs 0.02 for the same fold).
        "ich+kdop+ach": lambda i: clip_planes_batch(
            jax.tree_util.tree_map(
                lambda a: a[None],
                translate_poly(
                    scale_poly(unit_cube(F=F, S=S, dtype=verts.dtype),
                               vary(iv["extent"], i) * 2.0),
                    vary(iv["bb_center"], i),
                ),
            ),
            kdop_planes(
                vary(verts, i), vmask,
                ich(vary(verts, i), vmask,
                    limit=cfg.ich_include_point_limit)["normals"],
                ich(vary(verts, i), vmask,
                    limit=cfg.ich_include_point_limit)["face_valid"],
                gap=iv["mas"] / cfg.ach_plane_gap_inverse,
            )[0][None],
            kdop_planes(
                vary(verts, i), vmask,
                ich(vary(verts, i), vmask,
                    limit=cfg.ich_include_point_limit)["normals"],
                ich(vary(verts, i), vmask,
                    limit=cfg.ich_include_point_limit)["face_valid"],
                gap=iv["mas"] / cfg.ach_plane_gap_inverse,
            )[1][None],
        ),
        "cell_plane_sets": lambda i: _cell_plane_sets(
            vary(iv["seeds"], i), kN, iv["extent"], iv["bb_center"]
        ),
        # Production path: two-pass fold (walls + prefix bisectors, exact
        # tail filter, compacted tail fold).
        "conv clip fold": lambda i: _two_pass_cell_clip(
            jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a[None], (C,) + a.shape),
                vary(iv["ach"], i),
            ),
            vary(iv["cell_planes"], i), iv["cell_pmask"],
            vary(iv["seeds"], i) * iv["extent"] + iv["bb_center"],
            cfg.voronoi_prefix,
        ),
        "conv clip 1pass": lambda i: clip_planes_batch(
            jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a[None], (C,) + a.shape),
                vary(iv["ach"], i),
            ),
            vary(iv["cell_planes"], i), iv["cell_pmask"],
        ),
        "mesh clip": lambda i: jax.vmap(
            lambda pl_, pm_: clip_trisoup(
                tri_corners, tmask, pl_, pm_, max_out=Tp
            )
        )(vary(iv["cell_planes"], i), iv["cell_pmask"]),
        "finish(refit/caps)": lambda i: _finish_pieces(
            vary(iv["conv"], i),
            vary(iv["mtris"], i), iv["mmask"], vary(iv["cell_planes"], i),
            iv["cell_pmask"], tris_b, tmask_b, iv["mas"], cfg,
        ),
        "pack": lambda i: _pack_candidates(
            vary(iv["conv"], i), vary(iv["mtris"], i), iv["mmask"],
            jnp.ones((C,), bool),
            jnp.zeros((C,), jnp.int32), jnp.full((C,), -1, jnp.int32),
            moments(vary(iv["conv"], i))[0], P, Tp, F, S,
        ),
    }
    only = os.environ.get("STAGES")
    for name, stage in stages.items():
        if only and name not in only:
            continue
        t0 = time.time()
        ms = timeit(scanned(stage), jnp.float32(0))
        print(
            f"{name:26s} raw={ms:8.2f} ms  device≈{ms - floor:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
