#!/usr/bin/env python
"""TPU micro-bench: banded solver vs per-iteration Pallas solver at 10k.

Isolates the three banded-solver cost centers:
  pallas-iter   — round-2 solver (per-outer-iteration launch + XLA gather)
  banded        — single-launch banded solver (kernel only, inputs ready)
  mega-gather   — the (Np, ~500) packed permute gather alone
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
NP_ = 10_000
K, M, G = 8, 4, 4
C = K * M + G
ITERS, SUB = 8, 2
MU = 0.5
W = 32


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
    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    f32 = jnp.float32
    v0 = jax.random.normal(ks[0], (NP_, 3), f32) * 0.1
    w0 = jax.random.normal(ks[1], (NP_, 3), f32) * 0.1
    delta = jax.random.randint(ks[2], (NP_, K), -W, W + 1, jnp.int32)
    rows = jnp.arange(NP_, dtype=jnp.int32)
    pidx = jnp.clip(rows[:, None] + delta, 0, NP_ - 1)
    rA = jax.random.normal(ks[3], (NP_, C, 3), f32) * 0.5
    rB = jax.random.normal(ks[4], (NP_, C, 3), f32) * 0.5
    nrm = jax.random.normal(ks[5], (NP_, C, 3), f32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    m_eff = jax.random.uniform(ks[6], (NP_, C), f32, 0.1, 1.0)
    target = jnp.zeros((NP_, C), f32)
    hit = jax.random.uniform(ks[7], (NP_, C)) < 0.3
    is_static = jax.random.uniform(ks[8], (NP_, C)) < 0.1
    iA_m = jnp.ones((NP_,), f32)
    sA = jnp.ones((NP_,), f32)
    iA_I = jnp.broadcast_to(jnp.eye(3, dtype=f32)[None], (NP_, 3, 3))

    from surtr_tpu.physics.solver_banded import solve_contacts_banded
    from surtr_tpu.physics.solver_pallas import solve_contacts_pallas

    @jax.jit
    def run_pallas(v0, w0):
        def body(c, _):
            v, w = solve_contacts_pallas(
                v0 + c * 1e-9, w0, pidx, rA, rB, nrm, m_eff, target, hit,
                is_static, iA_m, sA, iA_I,
                K=K, M=M, G=G, iters=ITERS, substeps=SUB, mu=MU,
            )
            return c + jnp.sum(v) + jnp.sum(w), None

        c, _ = jax.lax.scan(body, 0.0, None, length=REP)
        return c

    @jax.jit
    def run_banded(v0, w0):
        def body(c, _):
            v, w = solve_contacts_banded(
                v0 + c * 1e-9, w0, delta, rA, rB, nrm, m_eff, target, hit,
                is_static, iA_m, sA, iA_I,
                K=K, M=M, G=G, iters=ITERS, substeps=SUB, mu=MU, window=W,
            )
            return c + jnp.sum(v) + jnp.sum(w), None

        c, _ = jax.lax.scan(body, 0.0, None, length=REP)
        return c

    order = jax.random.permutation(ks[9], NP_)
    mega = jnp.concatenate(
        [rA.reshape(NP_, -1), rB.reshape(NP_, -1), nrm.reshape(NP_, -1),
         m_eff, target, v0, w0], axis=1
    )

    @jax.jit
    def run_gather(mega):
        def body(c, _):
            ms = (mega + c * 1e-9)[order]
            return c + jnp.sum(ms[:, 0]), None

        c, _ = jax.lax.scan(body, 0.0, None, length=REP)
        return c

    print(f"mega lanes = {mega.shape[1]}")
    print(f"pallas-iter  {timeit(run_pallas, v0, w0):7.2f} ms")
    print(f"banded       {timeit(run_banded, v0, w0):7.2f} ms")
    print(f"mega-gather  {timeit(run_gather, mega):7.2f} ms")

    # sanity: results agree
    va, wa = solve_contacts_pallas(
        v0, w0, pidx, rA, rB, nrm, m_eff, target, hit, is_static,
        iA_m, sA, iA_I, K=K, M=M, G=G, iters=ITERS, substeps=SUB, mu=MU,
    )
    vb, wb = solve_contacts_banded(
        v0, w0, delta, rA, rB, nrm, m_eff, target, hit, is_static,
        iA_m, sA, iA_I, K=K, M=M, G=G, iters=ITERS, substeps=SUB, mu=MU,
        window=W,
    )
    dv = float(jnp.abs(va - vb).max())
    dw = float(jnp.abs(wa - wb).max())
    print(f"max |dv|={dv:.2e} |dw|={dw:.2e}")


if __name__ == "__main__":
    main()
