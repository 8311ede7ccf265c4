"""Parity: TPU kernels vs the f64 adjacency-polyhedron oracle
(BASELINE config 0 — 'geometric parity against the C++ path')."""

import jax
import jax.numpy as jnp
import numpy as np

from surtr_tpu.ops.clip import clip_poly_planes, clip_poly_poly
from surtr_tpu.ops.moments import moments as jmoments
from surtr_tpu.ops.voronoi import voronoi_cells
from surtr_tpu.oracle.poly import (
    clip_polyhedron,
    cube_polyhedron,
    moments,
)
from surtr_tpu.oracle.voronoi import voronoi_cells_oracle
from surtr_tpu.types import unit_cube


def test_random_plane_sequences_match_oracle():
    rng = np.random.default_rng(11)
    for trial in range(6):
        planes = []
        for _ in range(5):
            n = rng.normal(size=3)
            n /= np.linalg.norm(n)
            planes.append(np.append(n, rng.uniform(-0.45, 0.15)))
        planes = np.asarray(planes)
        ours = clip_poly_planes(unit_cube(), jnp.asarray(planes, jnp.float32))
        v_t, c_t = jmoments(ours)
        oracle = clip_polyhedron(cube_polyhedron(), planes)
        v_o, c_o = moments(oracle)
        assert np.isclose(float(v_t), v_o, atol=2e-5), trial
        if v_o > 1e-4:
            assert np.allclose(np.asarray(c_t), c_o, atol=1e-4), trial


def test_voronoi_32_seeds_matches_oracle():
    """Config-0-scale Voronoi: per-cell volumes and centroids vs all-pairs
    f64 cells."""
    rng = np.random.default_rng(46354)
    seeds = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    cells = voronoi_cells(jnp.asarray(seeds), k=31)
    v_t, c_t = jmoments(cells)
    oc = voronoi_cells_oracle(seeds)
    v_o = np.array([moments(c)[0] for c in oc])
    c_o = np.array([moments(c)[1] for c in oc])
    assert np.allclose(np.asarray(v_t), v_o, atol=3e-5)
    assert np.allclose(np.asarray(c_t), c_o, atol=5e-4)


def test_fracture_fragment_volumes_match_oracle():
    """Cube fractured by 32 Voronoi cells: sorted fragment volumes match the
    oracle's polyhedron-clip fragments."""
    rng = np.random.default_rng(7)
    seeds = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    cells = voronoi_cells(jnp.asarray(seeds), k=31)
    target = unit_cube()
    frags = jax.vmap(lambda c: clip_poly_poly(target, c))(cells)
    v_t = np.sort(np.asarray(jmoments(frags)[0]))

    oc = voronoi_cells_oracle(seeds)
    # Oracle fragments: cube ∩ cell — same planes, f64 adjacency clip.
    v_o = []
    for cell in oc:
        # Recover the cell's planes from its faces is the TPU kernel's job;
        # the oracle clips the cube directly by the same bisectors instead.
        pass
    seeds64 = seeds.astype(np.float64)
    for i in range(32):
        planes = []
        order = np.argsort(np.sum((seeds64 - seeds64[i]) ** 2, axis=1))
        for j in order:
            if j == i:
                continue
            d = seeds64[j] - seeds64[i]
            nrm = d / np.linalg.norm(d)
            mid = (seeds64[i] + seeds64[j]) / 2
            planes.append(np.append(nrm, -nrm @ mid))
        frag = clip_polyhedron(cube_polyhedron(), planes)
        v_o.append(moments(frag)[0])
    v_o = np.sort(np.asarray(v_o))
    assert np.allclose(v_t, v_o, atol=3e-5)
    assert np.isclose(v_t.sum(), 1.0, atol=1e-4)


def test_reference_scale_drift_vs_oracle():
    """f32 drift at reference-model SCALES (bunny sits at ~±35 after its
    ×70 scale table entry; the unit-scale tolerances do not transfer
    automatically). Clip a bunny-scale cube by random plane sequences and
    bound the relative volume/centroid drift against the f64 oracle."""
    from surtr_tpu.types import scale_poly

    SCALE = 35.0
    rng = np.random.default_rng(23)
    rel_errs = []
    for trial in range(4):
        planes = []
        for _ in range(5):
            n = rng.normal(size=3)
            n /= np.linalg.norm(n)
            # plane offsets scaled with the geometry
            planes.append(np.append(n, rng.uniform(-0.45, 0.15) * SCALE))
        planes = np.asarray(planes)
        big = scale_poly(unit_cube(), jnp.full((3,), SCALE))
        ours = clip_poly_planes(
            big, jnp.asarray(planes, jnp.float32), tol=1e-6 * SCALE
        )
        v_t, c_t = jmoments(ours)

        oc = cube_polyhedron(half=0.5 * SCALE)
        oc = clip_polyhedron(oc, planes)
        v_o, c_o = moments(oc)
        if v_o < 1e-3 * SCALE**3:
            continue
        rel_errs.append(abs(float(v_t) - v_o) / v_o)
        assert np.allclose(np.asarray(c_t), c_o, atol=2e-3 * SCALE), trial
    assert rel_errs, "all trials degenerate"
    # measured drift ~1e-6..1e-5 relative; bound at 1e-4
    assert max(rel_errs) < 1e-4, rel_errs


def _l_prism():
    """Closed concave test solid: an L-shaped prism (cross-section area 3,
    height 1 → volume 3). Its plane cross-sections are non-convex, so caps
    exercise the closed-clip semantics the convex models cannot."""
    L = np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=np.float64
    )
    fan = [(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 5)]  # all inside this L
    verts = np.concatenate(
        [np.concatenate([L, np.zeros((6, 1))], 1),
         np.concatenate([L, np.ones((6, 1))], 1)]
    )  # bottom 0-5, top 6-11
    tris = []
    for a, b, c in fan:
        tris.append((a, c, b))              # bottom, outward -z
        tris.append((6 + a, 6 + b, 6 + c))  # top, outward +z
    for i in range(6):
        j = (i + 1) % 6
        tris.append((i, j, 6 + j))          # sides, outward
        tris.append((i, 6 + j, 6 + i))
    return verts, np.asarray(tris, np.int32)


def test_exact_caps_match_oracle_on_concave_solid():
    """Exact caps (ops/caps.py) vs the f64 closed-polyhedron clip
    (Poly::ClipPolyhedron semantics, /root/reference/Src/Poly.cpp:265-554):
    clipping the L-prism must leave a CLOSED capped soup whose signed volume
    matches the oracle's clipped-polyhedron volume — including non-convex
    and multi-segment caps."""
    from surtr_tpu.config import FractureConfig
    from surtr_tpu.ops.caps import cap_fans_batch
    from surtr_tpu.ops.clip_pallas import clip_planes_batch
    from surtr_tpu.ops.mesh_clip import clip_trisoup
    from surtr_tpu.oracle.poly import polyhedron_from_mesh
    from surtr_tpu.types import scale_poly, translate_poly

    verts, tris = _l_prism()
    corners = jnp.asarray(verts[tris], jnp.float32)
    tm = jnp.ones((len(tris),), bool)
    cfg = FractureConfig(
        cap_faces=8, cap_edges=48, cap_crossings=6, cap_tris=128,
        cap_pool=128,
    )
    # Bounding box poly of the L-prism, padded.
    box = translate_poly(
        scale_poly(unit_cube(F=16, S=12), jnp.asarray([2.0, 2.0, 1.0])),
        jnp.asarray([1.0, 1.0, 0.5]),
    )
    plane_sets = [
        # horizontal cut: cap IS the concave L cross-section
        [[0.0, 0.0, 1.0, -0.5]],
        # diagonal cut through the notch
        [[0.70710678, 0.70710678, 0.0, -1.6]],
        # two planes meeting inside the material
        [[0.0, 0.0, 1.0, -0.6], [1.0, 0.0, 0.0, -1.4]],
        # oblique
        [[0.6, 0.48, 0.64, -1.1]],
    ]
    oracle_poly = polyhedron_from_mesh(verts, np.asarray(tris))
    for planes in plane_sets:
        pl = jnp.asarray(planes, jnp.float32)
        K = pl.shape[0]
        pm = jnp.ones((K,), bool)
        conv = clip_planes_batch(
            jax.tree_util.tree_map(lambda a: a[None], box),
            pl[None], pm[None],
        )
        mt, mm, _ = clip_trisoup(corners, tm, pl, pm, max_out=192)
        cap_rows, cap_ok, _, _, dropped = cap_fans_batch(
            conv, mt[None], mm[None], pl[None], pm[None],
            corners[None], tm[None], jnp.float32(2.0), cfg,
        )
        assert int(dropped) == 0, planes
        a, b, c = mt[..., 0, :], mt[..., 1, :], mt[..., 2, :]
        surf = jnp.sum(
            jnp.where(mm, jnp.sum(a * jnp.cross(b, c), -1), 0.0)
        )
        ca, cb, cc2 = (
            cap_rows[0, :, 0, :], cap_rows[0, :, 1, :], cap_rows[0, :, 2, :]
        )
        caps = jnp.sum(
            jnp.where(cap_ok[0], jnp.sum(ca * jnp.cross(cb, cc2), -1), 0.0)
        )
        v_ours = float(surf + caps) / 6.0
        frag = clip_polyhedron(oracle_poly, np.asarray(planes, np.float64))
        v_o = moments(frag)[0]
        assert np.isclose(v_ours, v_o, rtol=2e-3, atol=1e-4), (
            planes, v_ours, v_o
        )
