"""Rasterizer tests (SURVEY §4: golden depth-buffer statistics on tiny
scenes)."""

import jax.numpy as jnp
import numpy as np

from surtr_tpu.render.camera import light_view_proj, look_at, ortho, perspective
import pytest

from surtr_tpu.render.raster import render_scene, rasterize_ids
@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """The XLA:CPU serialize()/deserialize() of this module's large render
    executables segfaults intermittently when the persistent compile cache
    tries to store them (observed at tests/test_scene.py::render in three
    full-suite runs, stack ending in compilation_cache
    put/get_executable_and_time -> executable.serialize). Keep these
    programs out of the on-disk cache; everything else stays cached."""
    import jax
    from jax._src import compilation_cache as _cc

    _prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()  # the enable flag alone does NOT stop reads/writes
    yield
    jax.config.update("jax_compilation_cache_dir", _prev)
    _cc.reset_cache()



def test_single_triangle_coverage_and_depth():
    tri = jnp.asarray([[[-1.0, -1, 0], [1, -1, 0], [0, 1, 0]]])
    mvp = perspective(45, 1.0, 0.1, 100) @ look_at((0, 0, 5), (0, 0, 0))
    depth, tid = rasterize_ids(tri, jnp.ones(1, bool), mvp, 64, 64)
    hit = np.asarray(tid >= 0)
    # Triangle occupies ~ half its bbox; bbox ~ 31x31 px.
    assert 350 < hit.sum() < 560
    d = np.asarray(depth)[hit]
    assert (d > 0.97).all() and (d < 1.0).all()
    # Winding-independent (no backface cull — caps face both ways).
    tri_cw = tri[:, ::-1]
    _, tid2 = rasterize_ids(tri_cw, jnp.ones(1, bool), mvp, 64, 64)
    assert (np.asarray(tid2 >= 0) == hit).all()


def test_z_buffer_orders_triangles():
    tris = jnp.asarray(
        [
            [[-1.0, -1, 0], [1, -1, 0], [0, 1, 0]],    # near
            [[-2.0, -2, -2], [2, -2, -2], [0, 2, -2]], # far, bigger
        ]
    )
    mvp = perspective(45, 1.0, 0.1, 100) @ look_at((0, 0, 5), (0, 0, 0))
    _, tid = rasterize_ids(tris, jnp.ones(2, bool), mvp, 64, 64)
    t = np.asarray(tid)
    # Center pixel shows the near triangle.
    assert t[40, 32] == 0
    # The far triangle is visible outside the near one's extent.
    assert (t == 1).sum() > 0


def test_behind_camera_culled():
    tri = jnp.asarray([[[-1.0, -1, 10], [1, -1, 10], [0, 1, 10]]])
    mvp = perspective(45, 1.0, 0.1, 100) @ look_at((0, 0, 5), (0, 0, 0))
    _, tid = rasterize_ids(tri, jnp.ones(1, bool), mvp, 32, 32)
    assert (np.asarray(tid) == -1).all()


def test_render_scene_shadow():
    """A floating square casts a shadow onto the ground square below."""
    quad = lambda y, s: [
        [[-s, y, -s], [-s, y, s], [s, y, s]],
        [[-s, y, -s], [s, y, s], [s, y, -s]],
    ]
    tris = jnp.asarray(quad(0.0, 3.0) + quad(2.0, 0.7), jnp.float32)
    valid = jnp.ones(4, bool)
    colors = jnp.full((4, 3), 0.8)
    cam = perspective(45, 1.0, 0.1, 100) @ look_at((0, 6, 7), (0, 0.5, 0))
    light_dir = jnp.asarray([0.0, -1.0, 0.01])
    lvp = light_view_proj(light_dir, (0, 1, 0), 6.0)
    img, depth = render_scene(
        tris, valid, colors, cam, lvp, light_dir, W=96, H=96, shadow_size=256
    )
    img = np.asarray(img)
    # Ground pixels split into lit and shadowed populations.
    ground_mask = np.asarray(depth) < 1.0
    vals = img[..., 0][ground_mask]
    assert vals.max() > 0.5          # lit ground
    assert vals.min() < 0.25         # shadowed region under the square


def test_pallas_raster_matches_jnp_path():
    """Interpret-mode parity of the banned/banded Pallas tile rasterizer
    against the jnp reference path (same depth and triangle ids)."""
    import numpy as np

    from surtr_tpu.render.camera import look_at, perspective
    from surtr_tpu.render.raster import _project, near_clip, _screen, raster_screen
    from surtr_tpu.render.raster_pallas import rasterize_ids_pallas

    rng = np.random.default_rng(3)
    T = 160
    centers = rng.uniform(-3, 3, (T, 1, 3)).astype(np.float32)
    tris = jnp.asarray(centers + rng.normal(0, 0.4, (T, 3, 3)).astype(np.float32))
    # one screen-large triangle (ground-quad analogue) exercises the head path
    tris = tris.at[0].set(
        jnp.asarray([[-30, -2, -30], [-30, -2, 30], [30, -2, 30]], jnp.float32)
    )
    valid = jnp.ones((T,), bool)
    cam = perspective(45, 1.0, 0.1, 100) @ look_at((7, 5, 7), (0, 0, 0))
    W = H = 96

    clip = _project(tris, cam)
    clip2, ok2 = near_clip(clip, valid)
    sx, sy, sz, _ = _screen(clip2, W, H)
    d_ref, t_ref = raster_screen(sx, sy, sz, ok2, W, H, use_pallas=False)
    d_pal, t_pal = rasterize_ids_pallas(sx, sy, sz, ok2, W, H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), atol=1e-6
    )
    assert (np.asarray(t_pal) == np.asarray(t_ref)).mean() > 0.999


def test_smooth_vertex_normals_shading():
    """Per-vertex-normal interpolation (reference VertexNormalColor,
    Mesh.h:4-13): a sphere shaded with smooth normals varies continuously
    inside each facet, while flat shading is constant per facet."""
    import numpy as np

    from surtr_tpu.io.models import icosphere, smooth_vertex_normals
    from surtr_tpu.render.camera import light_view_proj, look_at, perspective
    from surtr_tpu.render.raster import render_scene

    v, f = icosphere(subdiv=1, radius=1.0)
    tris = jnp.asarray(v[f])
    T = len(f)
    valid = jnp.ones((T,), bool)
    colors = jnp.full((T, 3), 0.8)
    vn = jnp.asarray(smooth_vertex_normals(v, f))
    # analytic check: sphere normals ≈ normalized positions
    nrm = np.asarray(vn).reshape(-1, 3)
    pos = np.asarray(tris).reshape(-1, 3)
    cos = np.sum(nrm * pos / np.linalg.norm(pos, axis=1, keepdims=True), 1)
    assert cos.min() > 0.9

    cam = perspective(45, 1.0, 0.1, 50) @ look_at((0, 0, 4), (0, 0, 0))
    ldir = jnp.asarray([-0.5, -0.8, -0.4])
    lvp = light_view_proj(ldir, (0, 0, 0), 3.0)
    W = H = 96
    img_s, _ = render_scene(
        tris, valid, colors, cam, lvp, ldir, W=W, H=H, shadow_size=64,
        normals=vn,
    )
    img_f, _ = render_scene(
        tris, valid, colors, cam, lvp, ldir, W=W, H=H, shadow_size=64,
    )
    s_ = np.asarray(img_s)
    f_ = np.asarray(img_f)
    assert s_.shape == (H, W, 3)
    # Smooth shading differs from flat and has smaller discontinuities:
    # compare the total gradient magnitude inside the sphere silhouette.
    g = lambda a: np.abs(np.diff(a[..., 0], axis=0)).sum() + np.abs(
        np.diff(a[..., 0], axis=1)
    ).sum()
    assert not np.allclose(s_, f_)
    assert g(s_) < g(f_)


def test_deferred_flat_shading_matches_forward_path():
    """The deferred flat-shading path (default: normals=None) must agree
    with the forward path (forced by flat per-corner normals) — the advisor
    (r3) measured ~2.5% of pixels diverging >0.2 when world positions were
    reconstructed by unprojecting the f32 z-buffer; the ray-plane
    reconstruction must hold agreement including the far ground plane."""
    import numpy as np

    from surtr_tpu.render.camera import light_view_proj, look_at, perspective
    from surtr_tpu.render.raster import render_scene

    rng = np.random.default_rng(9)
    T = 128
    centers = rng.uniform(-3, 3, (T, 1, 3)).astype(np.float32)
    tris = jnp.asarray(
        centers + rng.normal(0, 0.4, (T, 3, 3)).astype(np.float32)
    )
    # Far-extending ground plane — the advisor's worst case for the old
    # z-buffer unprojection (error grows ~z²/near).
    tris = tris.at[0].set(
        jnp.asarray([[-60, -2, -60], [-60, -2, 60], [60, -2, 60]], jnp.float32)
    )
    tris = tris.at[1].set(
        jnp.asarray([[-60, -2, -60], [60, -2, 60], [60, -2, -60]], jnp.float32)
    )
    valid = jnp.ones((T,), bool)
    colors = jnp.asarray(rng.uniform(0.2, 0.9, (T, 3)).astype(np.float32))
    cam = perspective(45, 1.0, 0.1, 200) @ look_at((8, 5, 8), (0, 0, 0))
    ldir = jnp.asarray([-0.4, -1.0, -0.3])
    # Light frustum fit to the scene bounds (the reference fits radius 100,
    # Surtr.cpp:87-88) — out-of-map shadow lookups are chaotic in BOTH
    # paths and would dominate the comparison.
    lvp = light_view_proj(ldir, (0, 0, 0), 100.0)
    W = H = 128

    # Flat per-corner normals force the forward path with identical shading
    # semantics (same face normal at every corner).
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    flat_normals = jnp.broadcast_to(n[:, None, :], (T, 3, 3))

    img_d, _ = render_scene(
        tris, valid, colors, cam, lvp, ldir, W=W, H=H, shadow_size=256
    )
    img_f, _ = render_scene(
        tris, valid, colors, cam, lvp, ldir, W=W, H=H, shadow_size=256,
        normals=flat_normals,
    )
    d = np.abs(np.asarray(img_d) - np.asarray(img_f)).max(axis=-1)
    # Shadow-boundary pixels may legitimately flip a PCF tap; bound the
    # fraction of diverging pixels and the mean error tightly.
    assert float(d.mean()) < 5e-3, float(d.mean())
    assert float((d > 0.2).mean()) < 2e-3, float((d > 0.2).mean())
