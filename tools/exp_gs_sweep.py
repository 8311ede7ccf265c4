#!/usr/bin/env python
"""Experiment (VERDICT r4 item 4): can a ONE-KERNEL Gauss-Seidel color
sweep beat the per-iteration Jacobi solver at 10k bodies?

True sequential GS on TPU needs cross-body velocity propagation INSIDE an
iteration: contacts grouped into colors (no two contacts of a color share a
body), colors processed sequentially with the velocity table resident in
VMEM. The slot-pair coloring (k_i, k_j) gives <= K^2 = 64 valid colors for
free. Everything else is cheap arithmetic — the question is purely the cost
of the per-color body gather/scatter, which on TPU must be one-hot MXU
contractions (Mosaic has no per-lane vector gather):

    per color:  onehot = (iota(CC, B) == ids)        VPU, CC*B lanes
                v_c    = v(6, B) @ onehot^T          MXU
                v     += dv(6, CC) @ onehot          MXU

This tool measures EXACTLY that roundtrip (with a contact-impulse-shaped
dv so nothing is DCE'd) for NC colors x IT iterations at the production
shape (B=10240 bodies, C/NC contacts per color), and prints the comparison
budget: the whole Jacobi prep+solve+integrate slice is ~2.2 ms/step and a
4-iter GS must also beat the 8x2 Jacobi's ~1.1 ms solver-only share to be
worth its accuracy risk.
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 10240          # bodies (lane axis)
K = 8              # pair slots per body
NC = 64            # colors (slot-pair coloring bound)
CC = 1280          # contacts per color (10k*8/64 up-rounded, lane axis)
IT = 4             # GS iterations
REP = 16


def _kernel(ids_ref, dvs_ref, v_ref, out_ref, *, nc: int, it: int):
    f32 = jnp.float32
    v = v_ref[:]                                       # (8, B) velocities
    lane = jax.lax.broadcasted_iota(jnp.int32, (CC, B), 1)
    for _ in range(it):
        def color(c, v):
            ids = ids_ref[pl.ds(c, 1), :]              # (1, CC) i32
            # one-hot (CC, B): contact row -> its body column.
            oh = (lane == ids.reshape(CC, 1)).astype(f32)
            # gather: per-contact body velocity (8, CC)
            vc = jax.lax.dot_general(
                v, oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            # contact-impulse-shaped update (stands in for the PGS row
            # math, which is tiny next to the gather/scatter)
            dv = dvs_ref[pl.ds(c * 8, 8), :] * jnp.tanh(vc)
            # scatter-add back
            upd = jax.lax.dot_general(
                dv, oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            return v + upd
        v = jax.lax.fori_loop(0, nc, color, v)
    out_ref[:] = v


@functools.partial(jax.jit, static_argnames=("nc", "it"))
def sweep(ids, dvs, v, nc=NC, it=IT):
    return pl.pallas_call(
        functools.partial(_kernel, nc=nc, it=it),
        grid=(1,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((NC, CC), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (NC * 8, CC), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, B), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(ids, dvs, v)


def main():
    rng = np.random.default_rng(0)
    # Valid coloring instance: per color, distinct bodies.
    ids = np.stack(
        [rng.permutation(B)[:CC] for _ in range(NC)]
    ).astype(np.int32)
    dvs = rng.normal(size=(NC * 8, CC)).astype(np.float32) * 1e-3
    v = rng.normal(size=(8, B)).astype(np.float32)
    ids, dvs, v = jnp.asarray(ids), jnp.asarray(dvs), jnp.asarray(v)

    @jax.jit
    def run(v):
        def body(c, _):
            return sweep(ids, dvs, c), None
        return jax.lax.scan(body, v, None, length=REP)[0]

    for _ in range(2):
        jax.block_until_ready(run(v))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(run(v))
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(ts)) / REP
    print(
        f"one-kernel GS sweep ({NC} colors x {IT} iters, B={B}, "
        f"{CC}/color): {ms:.2f} ms/step (floor ~{26.57/REP:.2f} incl)",
        flush=True,
    )
    print(
        "budget: whole Jacobi prep+solve+integrate ~2.2 ms; solver-only "
        "share ~1.1 ms — the sweep must come in well under that to win",
        flush=True,
    )


if __name__ == "__main__":
    main()
