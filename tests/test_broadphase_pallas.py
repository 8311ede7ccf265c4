"""Parity: the fused Pallas Morton-window broadphase (interpret mode)
against the XLA `_broadphase_sorted` + mutual-mask pair it replaces."""

import jax
import jax.numpy as jnp
import numpy as np

from surtr_tpu.physics.broadphase_pallas import broadphase_sorted_pallas
from surtr_tpu.physics.step import _broadphase_sorted


def _xla_reference(centers, lo, hi, owner, valid, K, W):
    pidx, pok, *_ = _broadphase_sorted(centers, lo, hi, owner, valid, K, W)
    partner_lists = pidx[pidx]
    me = jnp.arange(centers.shape[0], dtype=jnp.int32)[:, None, None]
    mutual = jnp.any(partner_lists == me, axis=-1)
    return pidx, pok & mutual


def _check(centers, owner, valid, K=4, W=8):
    centers = jnp.asarray(centers, jnp.float32)
    half = jnp.full_like(centers, 0.6)
    lo, hi = centers - half, centers + half
    owner = jnp.asarray(owner, jnp.int32)
    valid = jnp.asarray(valid)
    ref_idx, ref_ok = jax.jit(
        _xla_reference, static_argnums=(5, 6)
    )(centers, lo, hi, owner, valid, K, W)
    got_idx, got_ok = broadphase_sorted_pallas(
        centers, lo, hi, owner, valid, K, W, interpret=True
    )
    ref_idx, ref_ok, got_idx, got_ok = map(
        np.asarray, (ref_idx, ref_ok, got_idx, got_ok)
    )
    np.testing.assert_array_equal(got_ok, ref_ok)
    # Partner indices only matter where the slot is live.
    np.testing.assert_array_equal(
        np.where(got_ok, got_idx, -1), np.where(ref_ok, ref_idx, -1)
    )


def test_broadphase_pallas_matches_xla_random():
    rng = np.random.default_rng(3)
    n = 257
    centers = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    _check(centers, np.arange(n), np.ones(n, bool))


def test_broadphase_pallas_matches_xla_lattice_ties():
    # A regular lattice has many EXACT distance ties — exercises the stable
    # tie order (lowest candidate-delta first, lax.top_k's rule).
    side = 6
    g = np.arange(side, dtype=np.float32) * 1.02
    centers = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    n = len(centers)
    _check(centers, np.arange(n), np.ones(n, bool))


def test_broadphase_pallas_invalid_and_shared_owner():
    rng = np.random.default_rng(11)
    n = 140
    centers = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    owner = np.arange(n) // 2            # pairs share owners: no self-contact
    valid = rng.uniform(size=n) > 0.2
    _check(centers, owner, valid)



def _pairs(pidx, pok):
    s = set()
    pi, po = np.asarray(pidx), np.asarray(pok)
    for i in range(pi.shape[0]):
        for k in range(pi.shape[1]):
            if po[i, k]:
                s.add((i, int(pi[i, k])))
    return s


def _mutual(pidx, pok):
    """Apply the step's (Np, K, K) mutual check to a raw XLA result."""
    partner_lists = pidx[pidx]
    me = jnp.arange(pidx.shape[0], dtype=jnp.int32)[:, None, None]
    return pok & jnp.any(partner_lists == me, axis=-1)


def _check_exact(centers, owner, valid, K=8, half_lo=0.2, half_hi=0.6, seed=1):
    from surtr_tpu.physics.broadphase_pallas import (
        apply_theta_mutual, broadphase_exact_pallas,
    )
    from surtr_tpu.physics.step import _broadphase

    rng = np.random.default_rng(seed)
    n = len(centers)
    centers = jnp.asarray(centers)
    half = jnp.asarray(rng.uniform(half_lo, half_hi, (n, 3)).astype(np.float32))
    lo, hi = centers - half, centers + half
    owner = jnp.asarray(owner, jnp.int32)
    valid = jnp.asarray(valid)
    pidx_p, pok_p, mut = broadphase_exact_pallas(
        centers, lo, hi, owner, valid, K, interpret=True
    )
    pok_p = apply_theta_mutual(pidx_p, pok_p, mut)
    pidx_x, pok_x = _broadphase(centers, lo, hi, owner, valid, K, 256)
    assert _pairs(pidx_p, pok_p) == _pairs(pidx_x, _mutual(pidx_x, pok_x))


def test_broadphase_exact_pallas_matches_xla_exact():
    """Full-recall Pallas sweep == exact XLA block sweep + mutual mask.

    The Morton-window sweep misses 20-30% of the exact top-8 on dense piles
    (ROADMAP rej. 6); the exact kernel must miss NONE — its selection keys
    (quantized d² | piece id) are unique, so MUTUAL pair sets match the XLA
    exact sweep exactly up to equal-distance saturated-K ties, which the
    random half-extents make improbable."""
    rng = np.random.default_rng(5)
    n = 700
    centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.05
    _check_exact(centers, np.arange(n), valid)


def test_broadphase_exact_pallas_dense_pile():
    """Dense lattice pile (the Morton path's worst case): full recall.

    A uniform lattice saturates K with exact distance TIES (6 face + 12
    edge neighbors), where the kernel (lowest piece id) and XLA top_k
    (candidate block order) legitimately select different tied partners, so
    the mutual sets can differ on the tie group. Assert the GUARANTEED
    core instead: every face-neighbor pair (d = 1.02, strictly nearer than
    any tie group, so both sides select it before saturating) must be
    mutual-kept, and nothing beyond K is ever emitted."""
    from surtr_tpu.physics.broadphase_pallas import (
        apply_theta_mutual, broadphase_exact_pallas,
    )

    side = 9
    g = np.arange(side, dtype=np.float32) * 1.02
    centers = np.stack(
        np.meshgrid(g, g, g, indexing="ij"), -1
    ).reshape(-1, 3)
    n = len(centers)
    c = jnp.asarray(centers)
    half = jnp.full((n, 3), 0.52)
    lo, hi = c - half, c + half
    owner = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones((n,), bool)
    K = 8
    pidx_p, pok_p, mut = broadphase_exact_pallas(
        c, lo, hi, owner, valid, K, interpret=True
    )
    pok_p = apply_theta_mutual(pidx_p, pok_p, mut)
    kept = _pairs(pidx_p, pok_p)
    # Face neighbors along each lattice axis.
    idx = np.arange(n).reshape(side, side, side)
    missing = []
    for ax in range(3):
        a = np.moveaxis(idx, ax, 0)
        for i, j in zip(a[:-1].ravel(), a[1:].ravel()):
            if (int(i), int(j)) not in kept or (int(j), int(i)) not in kept:
                missing.append((int(i), int(j)))
    assert not missing, (len(missing), missing[:5])
    # Mutual symmetry of everything kept.
    assert all((j, i) in kept for (i, j) in kept)
