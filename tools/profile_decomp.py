#!/usr/bin/env python
"""Per-stage TPU timing of the 1k-seed decomposition (bench config 2 core).

Drives the PRODUCTION ``prepare_fracture`` with its ``profile_stage``
truncations (stage cost = delta between adjacent rows); every truncation
fences all upstream intermediates so DCE cannot trim a prefix. Same
fencing/amortization discipline as bench.py. SURTR_MODEL=pumpkin etc.
selects the model-scale workload.
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


def main():
    from surtr_tpu.config import FractureConfig
    from surtr_tpu.fracture.pipeline import prepare_fracture
    from surtr_tpu.io.models import get_model, sphere_point_cloud

    model = os.environ.get("SURTR_MODEL", "cube")
    cfg = FractureConfig(
        initial_decompose_cell_cnt=1024,
        max_pieces=1024,
        # Model-scale ACHs carry ~78 faces (72 k-DOP slabs); F=32 drops cap
        # faces and the volumes are garbage (see tests/test_tiling.py).
        max_faces=32 if model == "cube" else 96,
        max_face_verts=16 if model == "cube" else 32,
        max_piece_tris=128 if model != "cube" else 64,
        voronoi_neighbors=48,
        partial_pattern_cell_cnt=8,
        general_pattern_cell_cnt=8,
        voronoi_prefix=int(os.environ.get("SURTR_VPREFIX", "16")),
    )
    v, f = get_model(model)
    verts = jnp.asarray(v)
    corners = jnp.asarray(v[f])
    vm = jnp.ones(len(v), bool)
    tm = jnp.ones(len(f), bool)
    cloud = jnp.asarray(sphere_point_cloud())
    keys = jax.random.split(jax.random.PRNGKey(46354), REP)

    names = {
        1: "1 ich+kdop+ach",
        2: "2 +cell planes",
        3: "3 +patterns",
        4: "4 +conv clip fold",
        42: "42  (active+cull)",
        43: "43  (+pair pack)",
        44: "44  (+pooled fold)",
        5: "5 +cull+mesh clip",
        6: "6 +islands",
        45: "f1 occupancy",
        46: "f2 +pool+refit planes",
        47: "f3 +refit clip fold",
        7: "7 +finish(refit/caps)",
        99: "8 full (pack+metrics)",
    }
    stages = [1, 2, 3, 4, 5, 6, 7, 99]
    only = os.environ.get("STAGES")
    if only:
        stages = [int(s) for s in only.split(",")]
    prev = 0.0
    for st in stages:

        @jax.jit
        def run_many(ks, _st=st):
            def body(c, k):
                out = prepare_fracture(
                    verts, vm, corners, tm, cloud, k, cfg, profile_stage=_st
                )
                if _st == 99:
                    s = jnp.sum(out[0].valid) + out[2]["total_volume"]
                else:
                    s = out[0]
                return c + s.astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0), ks)[0]

        t0 = time.time()
        ms = timeit(run_many, keys)
        print(
            f"{names[st]:24s} cum={ms:8.2f} ms  delta={ms - prev:8.2f} ms"
            f"  (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
