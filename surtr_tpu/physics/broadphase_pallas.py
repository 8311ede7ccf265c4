"""Pallas TPU fused Morton-window broadphase.

Replaces the XLA tail of ``_broadphase_sorted`` (physics/step.py): after the
Morton argsort, the XLA path materializes a (Np, 2W, 11) candidate tensor
via 2W rolls of the sorted pack, scores it, runs ``lax.top_k`` over the 2W
axis, and then checks mutuality with a (Np, K, K) ``pidx[pidx]`` gather —
~30 MB of HBM traffic plus sort/gather launches per step. This kernel keeps
the whole sorted table in VMEM (11 rows × Np lanes ≈ 0.5 MB at 10k pieces)
and does the window compare, the stable top-K selection, and the mutual
check with lane ROLLS only.

Semantics match the XLA path exactly:
  * candidates of sorted lane i are lanes i±d (d = 1..W), masked to the
    valid rank range,
  * ok = AABB overlap & both-valid & different-owner,
  * score = -d² (squared center distance), top-K stable in the delta order
    [+1..+W, -1..-W] (ties keep the earlier delta — ``lax.top_k``'s
    lowest-index tie rule),
  * a pair slot survives only if it is MUTUAL: each side selected the other
    into its own top-K. In sorted space "j selected i" is selmat[-d] at
    lane i+d, i.e. a roll of the selection-bit matrix — no gather.

Mutuality nuance shared with the XLA path: non-mutual candidates still
consume top-K slots (selection happens before the mutual mask), and fill
slots (score −BIG) can never become mutual contacts because ok is
symmetric and the final flag requires the own-side score to be real.

Reference: the PhysX broadphase black box behind
/root/reference/Src/Surtr.cpp:330-331 (SURVEY §7 hard-part 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38


def _cumsum_rows(x):
    """Inclusive cumsum along the sublane (first) axis via log-step adds."""
    n = x.shape[0]
    k = 1
    while k < n:
        pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[: n - k]], axis=0)
        k *= 2
    return x


def _bp_kernel(pack_ref, orig_ref, pidx_ref, pok_ref, *, W, K, Np):
    f32 = jnp.float32
    N = pack_ref.shape[1]

    def _roll(x, d):
        # jnp.roll(x, -d, axis=1): lane i reads lane i+d. pltpu.roll only
        # accepts non-negative static shifts, so express -d mod N.
        return pltpu.roll(x, (N - d) % N, axis=1)
    big = jnp.asarray(BIG, f32)
    pack = pack_ref[:]                                  # (11, N)
    orig = orig_ref[:]                                  # (1, N) i32
    c = pack[0:3]
    lo = pack[3:6]
    hi = pack[6:9]
    own = pack[9:10]
    val = pack[10:11] > 0.5
    r = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    deltas = list(range(1, W + 1)) + [-d for d in range(1, W + 1)]
    score_rows, orig_rows = [], []
    for d in deltas:
        pj = _roll(pack, d)                             # lane i ← lane i+d
        cj, loj, hij = pj[0:3], pj[3:6], pj[6:9]
        ownj, valj = pj[9:10], pj[10:11] > 0.5
        rank_j = r + d
        in_rng = (rank_j >= 0) & (rank_j < Np)
        overlap = jnp.min(
            jnp.minimum(hij - lo, hi - loj), axis=0, keepdims=True
        ) >= 0.0
        ok = (
            overlap & in_rng & valj & val
            & (ownj != own)
        )
        diff = c - cj
        d2 = jnp.sum(diff * diff, axis=0, keepdims=True)
        score_rows.append(jnp.where(ok, -d2, -big))
        orig_rows.append(_roll(orig, d))
    scores = jnp.concatenate(score_rows, axis=0)        # (2W, N)
    origc = jnp.concatenate(orig_rows, axis=0)          # (2W, N) i32

    # Stable top-K extraction; slotcode records which k picked each row.
    # ``avail`` (not a −BIG re-mask) excludes picked rows: fill slots are
    # already at −BIG, so value masking alone would re-pick the same row
    # once everything remaining ties at −BIG. With avail, exhausted lanes
    # keep picking the lowest REMAINING row — exactly lax.top_k's
    # lowest-index fill order.
    selmat = jnp.zeros((2 * W, N), jnp.int32)
    slotcode = jnp.zeros((2 * W, N), jnp.int32)
    avail = jnp.ones((2 * W, N), bool)
    vals_k, origs_k = [], []
    for k in range(K):
        wk = jnp.where(avail, scores, -big)
        mx = jnp.max(wk, axis=0, keepdims=True)
        cand = avail & (wk >= mx)
        first = cand & (_cumsum_rows(cand.astype(jnp.int32)) == 1)
        fi = first.astype(jnp.int32)
        ff = first.astype(f32)
        vals_k.append(jnp.sum(ff * scores, axis=0, keepdims=True))
        origs_k.append(jnp.sum(fi * origc, axis=0, keepdims=True))
        selmat = selmat | fi
        slotcode = slotcode + fi * (k + 1)
        avail = avail & ~first

    # Mutual rows: mut[row(d)] lane i = "lane i+d selected its −d slot".
    # selmat row index for delta d: d-1 for +d, W+d-1 for −d.
    def row(d):
        return d - 1 if d > 0 else W - d - 1

    mut_rows = []
    for d in deltas:
        sel_back = selmat[row(-d) : row(-d) + 1]        # (1, N)
        mut_rows.append(_roll(sel_back, d))
    mut = jnp.concatenate(mut_rows, axis=0)             # (2W, N) i32

    pidx_out, pok_out = [], []
    for k in range(K):
        pick = (slotcode == (k + 1)).astype(jnp.int32)
        mutual_k = jnp.sum(pick * mut, axis=0, keepdims=True) > 0
        ok_k = (vals_k[k] > -big / 2) & mutual_k
        pidx_out.append(origs_k[k])
        pok_out.append(ok_k.astype(jnp.int32))
    pidx_ref[:] = jnp.concatenate(pidx_out, axis=0)
    pok_ref[:] = jnp.concatenate(pok_out, axis=0)


def broadphase_sorted_pallas(
    centers, lo, hi, owner, valid, K: int, window: int,
    interpret: bool = False,
):
    """Morton-window broadphase with the window sweep fused in one Pallas
    kernel. Returns (pidx, pok) in ORIGINAL piece order, matching the XLA
    ``_broadphase_sorted`` + mutual-mask pair of physics_step (the mutual
    check is already applied here)."""
    from surtr_tpu.physics.step import _morton

    Np = centers.shape[0]
    f = centers.dtype
    code = _morton(centers, valid)
    # Both permutations stay XLA: a fused in-kernel bitonic sort was built
    # and measured SLOWER (0.66 ms vs 0.45 for the two argsorts at 10k —
    # XLA's lane radix sort wins; see ROADMAP).
    order = jnp.argsort(code)
    inv = jnp.argsort(order)

    pack = jnp.concatenate(
        [centers, lo, hi, owner[:, None].astype(f),
         valid[:, None].astype(f)],
        axis=1,
    )[order]                                            # (Np, 11)

    Np_pad = max(((Np + 127) // 128) * 128, 128)
    packT = jnp.pad(pack.T, ((0, 0), (0, Np_pad - Np)))
    origT = jnp.pad(
        order.astype(jnp.int32)[None, :], ((0, 0), (0, Np_pad - Np))
    )

    kernel = functools.partial(_bp_kernel, W=window, K=K, Np=Np)
    pidxT, pokT = pl.pallas_call(
        kernel,
        grid=(1,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((11, Np_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, Np_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Np_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, Np_pad), jnp.int32),
            jax.ShapeDtypeStruct((K, Np_pad), jnp.int32),
        ],
        interpret=interpret,
    )(packT, origT)

    pidx_s = pidxT.T[:Np]                               # (Np, K) sorted rows
    pok_s = pokT.T[:Np] > 0
    return pidx_s[inv], pok_s[inv]
