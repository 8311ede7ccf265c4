#!/usr/bin/env python
"""TPU micro-bench: where does the Pallas clip fold spend its time?

Three variants at bench shapes (N=1024 cells, K=54 planes, F=32, S=16):
  all-masked   — every plane masked off: fori_loop + dist-test floor
  no-cut       — real planes that never remove a vertex (far half-spaces):
                 dist test + pl.when skip cost
  real         — nearest-first sorted bisector planes of a uniform 1k-seed
                 Voronoi pattern (the decomp_1k workload)
  all-cut      — random planes that almost always cut: worst-case _update
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
from surtr_tpu.fracture.pipeline import _cell_plane_sets
from surtr_tpu.ops.clip_pallas import clip_planes_batch_pallas
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import unit_cube

N, K, F, S = 1024, 54, 32, 16
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


def run_case(name, planes, mask):
    base = unit_cube(F=F, S=S)
    polys = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), base
    )

    @jax.jit
    def run(planes):
        def body(c, _):
            out = clip_planes_batch_pallas(polys, planes, mask)
            v, _ = moments(out)
            return c + jnp.sum(v), None

        c, _ = jax.lax.scan(body, 0.0, None, length=REP)
        return c

    ms = timeit(run, planes)
    print(f"{name:12s} {ms:7.2f} ms")
    return ms


def main():
    print(f"backend={jax.default_backend()}")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    mask_off = jnp.zeros((N, K), bool)
    dummy = jnp.tile(
        jnp.array([[0.0, 0.0, 1.0, -9.0]], jnp.float32)[None], (N, K, 1)
    )
    run_case("all-masked", dummy, mask_off)

    mask_on = jnp.ones((N, K), bool)
    run_case("no-cut", dummy, mask_on)

    cfg = FractureConfig()
    seeds = uniform_seeds(jax.random.PRNGKey(46354), N)
    cell_planes, cell_pmask = _cell_plane_sets(
        seeds, min(48, N - 1), jnp.ones(3, jnp.float32), jnp.zeros(3, jnp.float32)
    )
    kk = cell_planes.shape[1]
    print(f"real plane count K={kk}")
    run_case("real", cell_planes, cell_pmask)

    pn = jax.random.normal(k1, (N, K, 3))
    pn = pn / jnp.linalg.norm(pn, axis=-1, keepdims=True)
    pd = jax.random.uniform(k2, (N, K), minval=-0.45, maxval=0.05)
    rand_planes = jnp.concatenate([pn, pd[..., None]], -1)
    run_case("all-cut", rand_planes, mask_on)


if __name__ == "__main__":
    main()
