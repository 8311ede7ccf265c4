"""Seeded fracture-pattern generation.

Mirrors the reference's seed clouds (seeded determinism, not the exact
mt19937 bit-stream — SURVEY §3 RNG note):
  * uniform cube seeds for the initial decomposition
    (GenerateVoronoi(cellCount), Surtr.cpp:1984-2000: U(-0.5, 0.5)^3);
  * radial impact patterns: uniform direction × exponential length clamped to
    [1e-12, 0.5] (GenerateFracturePattern, Surtr.cpp:2072-2096).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surtr_tpu.ops.voronoi import voronoi_cells
from surtr_tpu.types import ConvexPoly


def uniform_seeds(key: jax.Array, n: int) -> jax.Array:
    return jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)


def radial_seeds(key: jax.Array, n: int, mean: float) -> jax.Array:
    """Exponential radial lengths around the origin (impact-local pattern)."""
    kd, kl = jax.random.split(key)
    d = jax.random.uniform(kd, (n, 3), minval=-1.0, maxval=1.0)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    ln = jax.random.exponential(kl, (n,)) * mean
    ln = jnp.clip(ln, 1e-12, 0.5)
    return d * ln[:, None]


def pattern_cells(
    seeds: jax.Array, k: int | None, F: int, S: int
) -> ConvexPoly:
    """Voronoi cells of a seed cloud in the unit cube (voro++ container
    parity: domain [-0.5, 0.5]^3, Surtr.cpp:2007-2011).

    k=None uses all-pairs bisectors — REQUIRED for the radial impact
    patterns: their extreme clustering gives cells hundreds of true Voronoi
    neighbors, and k-nearest pruning leaves overlapping cells (which then
    double-count fragment volume). Uniform clouds can prune safely."""
    n = seeds.shape[0]
    if k is None:
        k = n - 1
    return voronoi_cells(seeds, k=min(k, n - 1), F=F, S=S)
