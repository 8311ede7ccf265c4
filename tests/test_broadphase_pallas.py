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

