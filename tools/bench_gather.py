#!/usr/bin/env python
"""Measure PCF-shadow gather formulations on the TPU backend.

The shading pass's (H*W, 9) row gather from the pre-shifted (S*S, 9) PCF
stack measured ~7.5 ms/frame at 512^2 (tools/profile_render.py) — over half
the frame. Candidates here, all computing the same sd9 (or its transpose):

  rows9    — current: stack9[flat]                       (H*W, 9) rows
  rows16   — stack padded to 16-wide rows (sublane-even DMA)
  flat9    — nine (H*W,) scalar gathers from (S*S,) planes
  minor    — take along the MINOR axis: (9, S*S) table, out (9, H*W)
  bf16     — rows9 at bf16 (half the bytes)
  center1  — single-tap floor: one (H*W,) scalar gather

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_gather.py [S]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
H = W = 512
REP = 16


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, iters=5):
    for _ in range(2):
        fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) / REP


def scan_wrap(body):
    @jax.jit
    def run(idx, table):
        def f(c, _):
            return c + body((idx + c.astype(jnp.int32)) % (S * S), table), None
        return jax.lax.scan(f, jnp.float32(0), None, length=REP)[0]
    return run


def main():
    rng = np.random.default_rng(0)
    # Spatially coherent indices (like real light-space projections).
    base = np.clip(
        (np.arange(H * W) // W) * (S // H if S >= H else 1), 0, S - 2
    )
    jitter = rng.integers(0, S - 1, H * W)
    idx = jnp.asarray((base * S + jitter) % (S * S - S - 1), jnp.int32)
    stack9 = jnp.asarray(rng.normal(size=(S * S, 9)).astype(np.float32))

    def rows9(i, t):
        return jnp.sum(t[i][::97, :])

    def rows16(i, t):
        t16 = jnp.pad(t, ((0, 0), (0, 7)))
        return jnp.sum(t16[i][::97, :9])

    def flat9(i, t):
        acc = 0.0
        for k in range(9):
            acc = acc + jnp.sum(t[:, k][i][::97])
        return acc

    def minor(i, t):
        tT = t.T  # (9, S*S)
        out = jnp.take(tT, i, axis=1)  # (9, H*W)
        return jnp.sum(out[:, ::97])

    def bf16(i, t):
        tb = t.astype(jnp.bfloat16)
        return jnp.sum(tb[i][::97, :].astype(jnp.float32))


    def i16rows(i, t):
        tq = jnp.round(jnp.clip(t, -4, 4) * 8191).astype(jnp.int16)
        return jnp.sum(tq[i][::97, :].astype(jnp.float32))

    def attrs24(i, t):
        big = jnp.concatenate([t, t, t[:, :6]], axis=1)  # (S*S, 24)
        return jnp.sum(big[i][::97, :])

    def attrs18(i, t):
        big = jnp.concatenate([t, t], axis=1)  # (S*S, 18)
        return jnp.sum(big[i][::97, :])

    def center1(i, t):
        return jnp.sum(t[:, 4][i][::97])

    print(f"backend={jax.default_backend()} S={S} px={H*W}", flush=True)
    for name, fn in [
        ("rows9", rows9), ("rows16", rows16), ("flat9", flat9),
        ("minor", minor), ("bf16", bf16), ("center1", center1),
        ("i16rows", i16rows), ("attrs24", attrs24), ("attrs18", attrs18),
    ]:
        try:
            ms = timeit(scan_wrap(fn), idx, stack9)
            print(f"{name:8s} {ms:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
