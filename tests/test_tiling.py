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


def test_physics_bench_hull_capacity_is_exact():
    """The 10k physics bench runs at max_hull_verts=8 (workload-fit
    capacity): the pile's cube hulls have EXACTLY 8 vertices, so the
    capacity holds them with zero loss and the step results are identical
    to a padded Vh=32 run — pinned here on a small settling lattice."""
    from surtr_tpu.config import PhysicsConfig
    from surtr_tpu.fracture.types import PieceSet
    from surtr_tpu.physics.scene import build_scene
    from surtr_tpu.physics.step import physics_step
    from surtr_tpu.types import ConvexPoly

    cube = unit_cube(F=8, S=8)
    assert int(jnp.max(jnp.sum(cube.n_verts))) <= 24  # 6 faces × 4, welded 8
    n = 27
    xs = np.stack(
        np.meshgrid(*[np.arange(3)] * 3, indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float32)
    offsets = jnp.asarray(xs * 1.02 + np.array([-1.5, -1.45, -1.5]))
    conv = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), cube
    )
    fv = conv.face_verts + offsets[:, None, None, :]
    d = conv.planes[..., 3:4] - jnp.sum(
        conv.planes[..., :3] * offsets[:, None, :], -1, keepdims=True
    )
    conv = ConvexPoly(fv, conv.n_verts, jnp.concatenate([conv.planes[..., :3], d], -1))
    pieces = PieceSet(
        convex=conv, mesh=jnp.zeros((n, 1, 3, 3)),
        mesh_valid=jnp.zeros((n, 1), bool), valid=jnp.ones((n,), bool),
        group=jnp.arange(n, dtype=jnp.int32), tag=jnp.full((n,), -1, jnp.int32),
    )

    outs = {}
    for vh in (8, 32):
        pcfg = PhysicsConfig(single_piece_bodies=True, max_hull_verts=vh)
        scene = build_scene(pieces, pcfg, max_bodies=n)
        # Vh=8 must hold every hull vertex (capacity exact, no truncation).
        if vh == 8:
            assert bool(jnp.all(jnp.sum(scene.piece_vmask, axis=1) == 8))
        for _ in range(30):
            scene = physics_step(scene, pcfg)
        outs[vh] = np.asarray(scene.bodies.x)
    np.testing.assert_allclose(outs[8], outs[32], atol=1e-5)
