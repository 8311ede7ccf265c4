#!/usr/bin/env python
"""TPU micro-bench: Pallas clip kernel vs XLA scan fold at bench shapes."""

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

from surtr_tpu.ops.clip import clip_poly_planes
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


def main():
    base = unit_cube(F=F, S=S)
    polys = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), base
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pn = jax.random.normal(k1, (N, K, 3))
    pn = pn / jnp.linalg.norm(pn, axis=-1, keepdims=True)
    pd = jax.random.uniform(k2, (N, K), minval=-0.45, maxval=0.05)
    planes = jnp.concatenate([pn, pd[..., None]], -1)
    mask = jnp.ones((N, K), bool)

    @jax.jit
    def run_pallas(planes):
        def body(c, _):
            out = clip_planes_batch_pallas(polys, planes, mask)
            v, _ = moments(out)
            return c + jnp.sum(v), None

        return jax.lax.scan(body, jnp.float32(0), None, length=REP)[0]

    @jax.jit
    def run_scan(planes):
        def body(c, _):
            out = jax.vmap(lambda p, pls, pm: clip_poly_planes(p, pls, pm))(
                polys, planes, mask
            )
            v, _ = moments(out)
            return c + jnp.sum(v), None

        return jax.lax.scan(body, jnp.float32(0), None, length=REP)[0]

    t0 = time.time()
    ms_p = timeit(run_pallas, planes)
    print(f"pallas: {ms_p:.2f} ms  (compile+run {time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    ms_s = timeit(run_scan, planes)
    print(f"scan:   {ms_s:.2f} ms  (compile+run {time.time()-t0:.0f}s)", flush=True)
    # correctness cross-check on device
    out_p = clip_planes_batch_pallas(polys, planes, mask)
    out_s = jax.vmap(lambda p, pls, pm: clip_poly_planes(p, pls, pm))(
        polys, planes, mask
    )
    vp, _ = moments(out_p)
    vs, _ = moments(out_s)
    print("max vol diff:", float(jnp.max(jnp.abs(vp - vs))))
    print("vol sum pallas:", float(jnp.sum(vp)), "scan:", float(jnp.sum(vs)))


if __name__ == "__main__":
    main()
