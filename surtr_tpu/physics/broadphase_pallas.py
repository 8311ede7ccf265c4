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


# ---------------------------------------------------------------------------
# Exact full-recall sweep (round 4, VERDICT item 3)
# ---------------------------------------------------------------------------


_IMAX = 0x7FFFFFFF  # plain int: a jnp scalar would be a captured const

# Largest piece pool the exact sweep accepts. Selection keys are
# (quantized d² << id_bits | piece id) in 31 bits; id_bits grows with the
# pool (14 at ≤16k pieces, 16 at 64k) and the d² quantizer gives up the
# bits the ids take. Key UNIQUENESS (the property the in-kernel top-K
# merge needs) comes from the id field, so recall stays exact at every
# size — only the "nearest"-K tie-breaking coarsens. Past this cap the
# (Np, 16) f32 piece table (64 B/piece) stops fitting VMEM comfortably
# and step.py's "auto" falls back to the Morton window WITH a
# RecallDegradedWarning.
MAX_EXACT_NP = 65536


def _bp_exact_kernel(
    rng_ref, packT_ref, packR_ref, cab_ref, pidx_ref, pok_ref, th_ref,
    *, K, CH, ID_BITS
):
    """One 128-piece block (lanes) vs its sweep range of CH-piece chunks.

    FULL-recall sweep-and-prune: pieces are sorted along the longest world
    axis, so every candidate that can overlap a block lies inside the
    contiguous chunk range [rng[0], rng[1]) precomputed host-side from
    monotone interval envelopes (see broadphase_exact_pallas). Every
    candidate in range gets the exact 3-D AABB test; the K nearest survive
    per piece. Selection uses UNIQUE i32 keys (quantized d² << ID_BITS | ORIGINAL
    piece id), so top-K extraction is K cheap sublane min-reductions with
    equality mask-out — no sorts, no cumsums, no gathers — and the selected
    ids need no rank→orig decode afterwards. A scalar 3-D chunk-AABB guard
    skips in-range chunks that only overlap along the sweep axis.

    Outputs per block: the K selected KEYS (IMAX = empty; the caller strips
    the id field) and θ = the K-th-smallest selected key (IMAX when any slot
    is empty), which makes the mutual check a single (Np, K) gather:
    j selected i  ⇔  key(d², i) ≤ θ_j.

    packT: (16, 128) block fields on lanes; packR: (Np_pad, 16) all pieces
    rows-major; cab: (NCH, 8) per-chunk AABB unions in SMEM; rng: (NB, 2)
    i32 chunk ranges in SMEM, indexed by program_id (a blocked (1, 2) SMEM
    spec fails the mosaic block-shape rules).
    """
    blk = packT_ref[:]                                   # (16, 128)
    bc = blk[0:3]
    blo = blk[3:6]
    bhi = blk[6:9]
    bown = blk[9:10]
    bval = blk[10:11] > 0.5
    borig = blk[11:12]
    b = pl.program_id(0)

    # Block AABB union (over valid lanes) for the scalar chunk guard.
    big = jnp.asarray(BIG, jnp.float32)
    blo_u = [jnp.min(jnp.where(bval, blo[a : a + 1], big)) for a in range(3)]
    bhi_u = [jnp.max(jnp.where(bval, bhi[a : a + 1], -big)) for a in range(3)]

    QMAX = float((1 << (31 - ID_BITS)) - 1)  # d² quantizer ceiling
    QS = jnp.float32(QMAX / 3.0)             # normalized centers ⇒ d² ≤ 3
    pidx_ref[:] = jnp.full((K, 128), _IMAX, jnp.int32)

    def body(ch, _):
        guard = jnp.bool_(True)
        for a in range(3):
            guard &= (cab_ref[ch, a] <= bhi_u[a]) & (
                blo_u[a] <= cab_ref[ch, 3 + a]
            )

        @pl.when(guard)
        def _():
            rows = packR_ref[pl.ds(ch * CH, CH), :]      # (CH, 16)
            rc = rows[:, 0:3]
            rlo = rows[:, 3:6]
            rhi = rows[:, 6:9]
            rown = rows[:, 9:10]
            rval = rows[:, 10:11] > 0.5
            rorig = rows[:, 11:12]
            over = jnp.ones((CH, 128), bool)
            d2 = jnp.zeros((CH, 128), jnp.float32)
            for a in range(3):
                over &= (rlo[:, a : a + 1] <= bhi[a : a + 1, :]) & (
                    blo[a : a + 1, :] <= rhi[:, a : a + 1]
                )
                da = rc[:, a : a + 1] - bc[a : a + 1, :]
                d2 += da * da
            ok = (
                over & rval & bval
                & (rown != bown)
                & (rorig != borig)
            )
            q = jnp.minimum(d2 * QS, QMAX).astype(jnp.int32)
            oid = rorig.astype(jnp.int32)
            keys = jnp.where(
                ok,
                (q << ID_BITS) | (oid & ((1 << ID_BITS) - 1)),
                jnp.int32(_IMAX),
            )

            # Merge into the running best-K: K min-passes over the
            # (K + CH, 128) stack with equality mask-out (keys unique).
            stack = jnp.concatenate([pidx_ref[:], keys], axis=0)
            outs = []
            for _ in range(K):
                m = jnp.min(stack, axis=0, keepdims=True)     # (1, 128)
                outs.append(m)
                stack = jnp.where(stack == m, jnp.int32(_IMAX), stack)
            pidx_ref[:] = jnp.concatenate(outs, axis=0)

        return 0

    jax.lax.fori_loop(rng_ref[b, 0], rng_ref[b, 1], body, 0)

    best = pidx_ref[:]
    pok_ref[:] = (best != _IMAX).astype(jnp.int32)
    # θ = K-th smallest selected key; max() hits IMAX exactly when some slot
    # is empty (fewer than K candidates ⇒ j selected everything it saw).
    th_ref[:] = jnp.broadcast_to(
        jnp.max(best, axis=0, keepdims=True), th_ref.shape
    )


def broadphase_exact_pallas(
    centers, lo, hi, owner, valid, K: int, interpret: bool = False,
    chunk: int = 128,
):
    """Exact (full-recall) broadphase: fused sweep-and-prune in VMEM.

    The PhysX contract is "no missed pairs" (the black box behind
    /root/reference/Src/Surtr.cpp:330-331); the Morton-window sweep misses
    20-30% of the exact top-8 on dense piles (ROADMAP rej. 6) and the XLA
    grid path costs ~20 ms in gathers. This kernel sorts pieces along the
    longest world axis and, per 128-piece block, sweeps exactly the chunks
    whose sweep-axis intervals can reach the block — a contiguous range by
    construction from monotone envelopes (prefix-max of chunk interval
    highs, suffix-min of lows), computed host-side with two searchsorteds.
    Every in-range candidate still gets the exact 3-D AABB test, so recall
    is exact for ANY ordering; the sort only bounds the work (dense piles:
    ~10 of ~80 chunks per block vs the O(N²) full sweep). Np ≤ MAX_EXACT_NP
    (ids pack into 14-16 key bits, sized to the pool); larger pools use the
    sorted/grid paths — step.py warns when "auto" degrades there.

    Returns (pidx (Np, K), pok (Np, K), (key_ji (Np, K) i32, theta (Np,)
    i32)) in ORIGINAL order. pok is NOT mutual-masked; mutuality is
    key_ji ≤ theta[pidx] — the caller folds the theta gather into a
    partner gather it already pays for (narrowphase packed tables), or
    applies it inline on cold paths.
    """
    Np = centers.shape[0]
    assert Np <= MAX_EXACT_NP, (
        f"exact sweep accepts Np <= {MAX_EXACT_NP} (VMEM piece table); "
        "use broadphase='sorted'/'grid' beyond"
    )
    ID_BITS = max(14, (max(Np, 2) - 1).bit_length())  # ids 0..Np-1 unique
    ID_MASK = (1 << ID_BITS) - 1
    f = centers.dtype
    big = jnp.asarray(BIG, f)

    # Sweep axis = the longest VALID world extent (one-hot pick keeps the
    # axis choice traceable).
    wlo = jnp.min(jnp.where(valid[:, None], centers, big), axis=0)
    whi = jnp.max(jnp.where(valid[:, None], centers, -big), axis=0)
    axis_oh = jnp.where(
        jnp.any(valid),
        (jnp.arange(3) == jnp.argmax(whi - wlo)).astype(f),
        jnp.array([1.0, 0.0, 0.0], f),
    )
    cx = centers @ axis_oh
    # Invalid rows sort to the top so they pad the tail chunks.
    order = jnp.argsort(jnp.where(valid, cx, big))
    inv = jnp.argsort(order)

    pack = jnp.concatenate(
        [
            centers, lo, hi,
            owner[:, None].astype(f), valid[:, None].astype(f),
            jnp.arange(Np, dtype=f)[:, None],            # orig id (exact ≤ 2^24)
            jnp.zeros((Np, 4), f),
        ],
        axis=1,
    )[order]                                             # (Np, 16)
    # Normalized centers: d² quantization needs a bounded range.
    ext = jnp.maximum(jnp.max(whi - wlo), 1e-6)
    pack = pack.at[:, 0:3].set((pack[:, 0:3] - wlo) / ext)

    CH = chunk
    Np_pad = max(-(-Np // CH) * CH, CH)
    NB = -(-Np_pad // 128)
    Np_pad = max(Np_pad, NB * 128)
    NCH = Np_pad // CH
    packR = jnp.pad(pack, ((0, Np_pad - Np), (0, 0)))
    packT = packR.T                                      # (16, Np_pad)

    v_s = jnp.pad(valid[order], (0, Np_pad - Np))[:, None]
    # Per-chunk AABB unions (invalid rows excluded) for the scalar guard.
    rlo = jnp.where(v_s, packR[:, 3:6], big).reshape(NCH, CH, 3)
    rhi = jnp.where(v_s, packR[:, 6:9], -big).reshape(NCH, CH, 3)
    cab = jnp.concatenate(
        [jnp.min(rlo, axis=1), jnp.max(rhi, axis=1),
         jnp.zeros((NCH, 2), f)],
        axis=1,
    )                                                    # (NCH, 8)

    # Sweep-axis interval envelopes. m_hi prefix-max / m_lo suffix-min are
    # monotone, so the set of chunks whose interval [m_lo, m_hi] can touch
    # a query interval [qlo, qhi] is contained in the contiguous range
    # [first chunk with prefmax_hi >= qlo, last chunk with sufmin_lo <= qhi]
    # — every true overlap is inside it (proof: the first qualifying chunk
    # IS the searchsorted witness; monotonicity bounds both ends).
    v_ch = v_s[:, 0].reshape(NCH, CH)
    c_hix = jnp.max(
        jnp.where(
            v_ch,
            (packR[:, 6:9] * axis_oh[None]).sum(-1).reshape(NCH, CH),
            -big,
        ),
        axis=1,
    )
    c_lox = jnp.min(
        jnp.where(
            v_ch,
            (packR[:, 3:6] * axis_oh[None]).sum(-1).reshape(NCH, CH),
            big,
        ),
        axis=1,
    )
    prefmax_hi = jax.lax.cummax(c_hix)
    sufmin_lo = -jax.lax.cummax(-c_lox[::-1])[::-1]

    # Per-block query intervals over valid lanes.
    b_lox = (packR[:, 3:6] * axis_oh[None]).sum(-1).reshape(NB, 128)
    b_hix = (packR[:, 6:9] * axis_oh[None]).sum(-1).reshape(NB, 128)
    bv = v_s[:, 0].reshape(NB, 128)
    qlo = jnp.min(jnp.where(bv, b_lox, big), axis=1)     # (NB,)
    qhi = jnp.max(jnp.where(bv, b_hix, -big), axis=1)
    lo_ch = jnp.searchsorted(prefmax_hi, qlo, side="left")
    hi_ch = jnp.searchsorted(sufmin_lo, qhi, side="right")
    rng = jnp.stack(
        [jnp.minimum(lo_ch, NCH), jnp.minimum(hi_ch, NCH)], axis=1
    ).astype(jnp.int32)                                  # (NB, 2)

    kernel = functools.partial(_bp_exact_kernel, K=K, CH=CH, ID_BITS=ID_BITS)
    keysT, pokT, thT = pl.pallas_call(
        kernel,
        grid=(NB,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np_pad, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, Np_pad), jnp.int32),
            jax.ShapeDtypeStruct((K, Np_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, Np_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rng, packT, packR, cab)

    keys = keysT.T[:Np][inv]                             # (Np, K) i32 keys
    pok = (pokT.T[:Np] > 0)[inv]
    theta = thT[0][:Np][inv]                             # (Np,)
    pidx = keys & ID_MASK                                # orig ids directly

    # Mutual: j selected i ⇔ (q(d²) << ID_BITS | i) ≤ θ_j. q is symmetric,
    # so key_ji comes straight off the own-side key; the θ_j gather is left
    # to the caller (it rides the narrowphase partner gather).
    me = jnp.arange(Np, dtype=jnp.int32)[:, None]
    key_ji = (keys & ~jnp.int32(ID_MASK)) | me
    return pidx, pok, (key_ji, theta)


def apply_theta_mutual(pidx, pok, mut):
    """Inline mutual mask (standalone θ[pidx] gather) for paths that do
    not fold it into an existing partner gather."""
    key_ji, theta = mut
    Np = theta.shape[0]
    return pok & (key_ji <= theta[jnp.clip(pidx, 0, Np - 1)])
