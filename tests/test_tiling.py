"""Voronoi-cell tiling invariants at model scale.

The initial decomposition's cells are (pruned) Voronoi cells of the ACH
domain — they tile it: Σ vol(cell) == vol(ACH). This held exactly on the
cube bench workload but silently broke at model scale: the pumpkin ACH
carries ~78 faces (ICH limit 20 → 72 k-DOP slab planes + box faces), so a
max_faces=32 pool drops cap faces and the fold reported Σ = 696 against a
true 873 (f64 + Monte-Carlo verified). These tests pin the invariant at a
capacity that fits, and document the residual cap-vertex truncation band
at S=32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pattern import uniform_seeds
from surtr_tpu.fracture.pipeline import _cell_plane_sets, _two_pass_cell_clip
from surtr_tpu.io.models import get_model
from surtr_tpu.ops.clip_pallas import clip_planes_batch
from surtr_tpu.ops.hull import ich
from surtr_tpu.ops.kdop import kdop_planes
from surtr_tpu.ops.moments import moments
from surtr_tpu.types import scale_poly, translate_poly, unit_cube

BIG = 3.4e38


def _fold(model, F, S, C, seed=46354):
    cfg = FractureConfig()
    v, f = get_model(model)
    verts = jnp.asarray(v)
    vmask = jnp.ones(len(v), bool)

    @jax.jit
    def run(k):
        h = ich(verts, vmask, limit=cfg.ich_include_point_limit)
        big = jnp.asarray(BIG, verts.dtype)
        vm = vmask[:, None]
        bb_min = jnp.min(jnp.where(vm, verts, big), 0)
        bb_max = jnp.max(jnp.where(vm, verts, -big), 0)
        bb_center = (bb_min + bb_max) * 0.5
        extent = bb_max - bb_min
        mas = jnp.max(extent)
        planes, pm = kdop_planes(
            verts, vmask, h["normals"], h["face_valid"],
            gap=mas / cfg.ach_plane_gap_inverse,
        )
        ach = translate_poly(
            scale_poly(unit_cube(F=F, S=S, dtype=verts.dtype), extent * 2.0),
            bb_center,
        )
        ach = jax.tree_util.tree_map(
            lambda a: a[0],
            clip_planes_batch(
                jax.tree_util.tree_map(lambda a: a[None], ach),
                planes[None], pm[None],
            ),
        )
        va = moments(jax.tree_util.tree_map(lambda a: a[None], ach))[0][0]
        seeds = uniform_seeds(k, C)
        cp, cm = _cell_plane_sets(seeds, min(47, C - 1), extent, bb_center)
        ach_b = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (C,) + a.shape), ach
        )
        conv = _two_pass_cell_clip(
            ach_b, cp, cm, seeds * extent + bb_center, cfg.voronoi_prefix
        )
        vol, _ = moments(conv)
        return va, jnp.sum(vol), jnp.sum(pm)

    return jax.block_until_ready(run(jax.random.PRNGKey(seed)))


def test_cube_cells_tile_ach_exactly():
    # rtol 5e-3: at C=128 cells are larger than the 1k-bench cells and a
    # few caps brush the S=16 vertex cap (~0.2% deficit); the capacity bug
    # class this guards against is an ~80% error.
    va, s, _ = _fold("cube", F=32, S=16, C=128)
    np.testing.assert_allclose(float(s), float(va), rtol=5e-3)


def test_pumpkin_ach_needs_more_than_32_faces():
    # The reference default ICH limit yields ~72 slab planes — the guard
    # that F=32 is NOT enough for model-scale ACHs (this is what silently
    # broke the round-3 model bench).
    _, _, n_planes = _fold("cube", F=32, S=16, C=8)
    v, f = get_model("pumpkin")
    verts = jnp.asarray(v)
    vmask = jnp.ones(len(v), bool)
    h = ich(verts, vmask, limit=FractureConfig().ich_include_point_limit)
    _, pm = kdop_planes(
        verts, vmask, h["normals"], h["face_valid"], gap=0.0
    )
    assert int(pm.sum()) > 32


@pytest.mark.slow
def test_pumpkin_cells_tile_ach_within_cap_band():
    # F=96 holds the 78-face ACH exactly (ACH volume matches the f64 /
    # Monte-Carlo value 873.2 ± 2); Σ cells sits within the documented
    # cap-vertex truncation band at S=32 (~2%).
    va, s, _ = _fold("pumpkin", F=96, S=32, C=64)
    assert abs(float(va) - 873.2) < 5.0
    assert float(s) == pytest.approx(float(va), rel=0.03)


def test_cube_bench_capacity_tiles():
    # The bench runs the cube 1k configs at F=26 (workload-fit capacity,
    # bench.py); pin that it stays inside the same truncation band.
    va, s, _ = _fold("cube", F=26, S=16, C=128)
    np.testing.assert_allclose(float(s), float(va), rtol=5e-3)
