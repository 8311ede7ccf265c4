#!/usr/bin/env python
"""Per-stage TPU timing of a do_fracture impact event.

SURTR_IMPACT=cube32 (bench config 0) or iframe (the interactive-frame
fracture shape). Stage cost = delta between adjacent rows; fencing
matches bench.py (REP-scanned, scalar fetch).
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
    from surtr_tpu.config import FractureConfig
    from surtr_tpu.fracture.pipeline import do_fracture, prepare_fracture
    from surtr_tpu.io.models import get_model, sphere_point_cloud

    shape = os.environ.get("SURTR_IMPACT", "cube32")
    # The iframe bench runs Scene("cube"), whose convex-model dispatch turns
    # exact_caps OFF (legacy refit-face caps are exact for convex solids) —
    # default to matching it; SURTR_EXACT_CAPS=1 forces the concave path.
    exact_caps = os.environ.get("SURTR_EXACT_CAPS", "0") == "1"
    if shape == "iframe":
        cfg = FractureConfig(
            initial_decompose_cell_cnt=64,
            max_pieces=256,
            max_active_pieces=32,
            max_piece_tris=64,
            max_mesh_tris=512,
            partial_pattern_cell_cnt=128,
            general_pattern_cell_cnt=64,
            voronoi_neighbors=48,
            exact_caps=exact_caps,
        )
    else:
        cfg = FractureConfig(
            initial_decompose_cell_cnt=32,
            max_pieces=256,
            max_active_pieces=16,
            max_piece_tris=128,
            partial_pattern_cell_cnt=128,
            voronoi_neighbors=48,
            general_pattern_cell_cnt=8,
            exact_caps=exact_caps,
        )
    v, f = get_model("cube")
    cloud = jnp.asarray(sphere_point_cloud())
    pieces, ctx, _ = prepare_fracture(
        jnp.asarray(v), jnp.ones(len(v), bool), jnp.asarray(v[f]),
        jnp.ones(len(f), bool), cloud, jax.random.PRNGKey(46354), cfg,
    )
    impact = jnp.array([1.5, 1.5, 1.5])

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
    stages = [1, 2, 3, 4, 5, 99]
    only = os.environ.get("STAGES")
    if only:
        stages = [int(s) for s in only.split(",")]
    prev = 0.0
    for st in stages:

        @jax.jit
        def run_many(p, _st=st):
            def body(c, i):
                out, met = do_fracture(
                    p, ctx, impact + c * 0, 0, cfg, partial=True,
                    profile_stage=_st,
                )
                if _st < 99:
                    s = out.astype(jnp.float32)
                else:
                    # Fence EVERY leaf — a partial fence lets XLA DCE the
                    # pack gathers and under-measure the tail.
                    s = jnp.float32(0)
                    for leaf in jax.tree_util.tree_leaves(out):
                        s = s + jnp.sum(leaf).astype(jnp.float32)
                    s = s + met["total_volume"]
                return c + s, None

            return jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))[0]

        t0 = time.time()
        ms = timeit(run_many, pieces)
        print(
            f"{names[st]:24s} cum={ms:8.2f} ms  delta={ms - prev:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
