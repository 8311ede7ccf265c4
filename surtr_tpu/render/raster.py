"""Tiled software rasterizer in pure JAX.

Two passes, matching the reference frame (Render, Surtr.cpp:370-664):
  1. shadow pass — depth-only from the light's ortho frustum
     (Shadow.hlsli semantics, depth bias at sample time);
  2. opaque pass — z-buffered flat-shaded triangles with Lambert diffuse,
     ambient 0.08 and 3×3 (9-tap) PCF shadow filtering
     (Shader.hlsli:97-145 CalcShadowFactor).

Rasterization strategy: the image is processed in row tiles; for each tile a
`lax.scan` over triangle blocks evaluates edge functions for (pixels × block)
at once and folds a running (depth, tri-id) z-buffer. Shading is deferred —
one pass over pixels gathers per-triangle attributes by the winning id.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 3.4e38


def _project(tris_world: jax.Array, mvp: jax.Array):
    """(T, 3, 3) world triangles → clip space (T, 3, 4)."""
    ones = jnp.ones(tris_world.shape[:-1] + (1,), tris_world.dtype)
    hom = jnp.concatenate([tris_world, ones], axis=-1)
    return jnp.einsum(
        "ij,tvj->tvi", mvp, hom, precision=jax.lax.Precision.HIGHEST
    )


def _screen(clip: jax.Array, W: int, H: int):
    """Clip → (screen xy, ndc z, 1/w) with w-clamp for behind-camera verts."""
    w = clip[..., 3:4]
    ws = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    ndc = clip[..., :3] / ws
    x = (ndc[..., 0] + 1.0) * 0.5 * W
    y = (1.0 - ndc[..., 1]) * 0.5 * H
    return x, y, ndc[..., 2], 1.0 / ws[..., 0]


@functools.partial(
    jax.jit, static_argnames=("W", "H", "tile_rows", "tri_block", "use_pallas")
)
def rasterize_ids(
    tris_world: jax.Array,
    valid: jax.Array,
    mvp: jax.Array,
    W: int,
    H: int,
    tile_rows: int = 32,
    tri_block: int = 512,
    use_pallas: bool | None = None,
):
    """Z-buffer rasterization. Returns (depth (H, W), tri_id (H, W) i32;
    -1 = background)."""
    T = tris_world.shape[0]
    clip = _project(tris_world, mvp)
    sx, sy, sz, inv_w = _screen(clip, W, H)            # (T, 3) each
    # Cull triangles behind the camera (any w <= 0) or invalid.
    ok = valid & jnp.all(clip[..., 3] > 1e-6, axis=-1)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and W % 128 == 0 and H % 32 == 0:
        from surtr_tpu.render.raster_pallas import rasterize_ids_pallas

        return rasterize_ids_pallas(sx, sy, sz, ok, W, H)

    pad_t = (-T) % tri_block
    def padt(a, fill=0.0):
        return jnp.pad(a, [(0, pad_t)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)
    sx, sy, sz = padt(sx), padt(sy), padt(sz)
    ok = jnp.pad(ok, (0, pad_t))
    nblk = (T + pad_t) // tri_block

    rows_per = tile_rows
    ntile = (H + rows_per - 1) // rows_per
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5

    def tile_fn(t):
        y0 = t * rows_per
        ys = y0 + jnp.arange(rows_per, dtype=jnp.float32) + 0.5
        px = jnp.broadcast_to(xs[None, :], (rows_per, W)).reshape(-1)
        py = jnp.broadcast_to(ys[:, None], (rows_per, W)).reshape(-1)
        npx = rows_per * W

        def blk_fn(carry, b):
            depth, tid = carry
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * tri_block, tri_block)
            ax, ay = sl(sx)[:, 0], sl(sy)[:, 0]
            bx, by = sl(sx)[:, 1], sl(sy)[:, 1]
            cx, cy = sl(sx)[:, 2], sl(sy)[:, 2]
            za, zb, zc = sl(sz)[:, 0], sl(sz)[:, 1], sl(sz)[:, 2]
            okb = sl(ok)
            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
            # Edge functions e(p; u→v) = cross(v−u, p−u); e_bc(a) == area.
            e0 = (cx - bx) * (py[:, None] - by) - (cy - by) * (px[:, None] - bx)
            e1 = (ax - cx) * (py[:, None] - cy) - (ay - cy) * (px[:, None] - cx)
            e2 = (bx - ax) * (py[:, None] - ay) - (by - ay) * (px[:, None] - ax)
            w0 = e0 * inv_area
            w1 = e1 * inv_area
            w2 = e2 * inv_area
            cov = (
                (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                & okb[None, :]
                & (jnp.abs(area) > 1e-12)[None, :]
            )
            z = w0 * za + w1 * zb + w2 * zc
            z = jnp.where(cov & (z > 0) & (z < 1), z, BIG)
            best = jnp.argmin(z, axis=1)
            zbest = jnp.take_along_axis(z, best[:, None], axis=1)[:, 0]
            better = zbest < depth
            depth = jnp.where(better, zbest, depth)
            tid = jnp.where(better, b * tri_block + best, tid)
            return (depth, tid), None

        depth0 = jnp.full((npx,), BIG, jnp.float32)
        tid0 = jnp.full((npx,), -1, jnp.int32)
        (depth, tid), _ = jax.lax.scan(
            blk_fn, (depth0, tid0), jnp.arange(nblk)
        )
        return depth.reshape(rows_per, W), tid.reshape(rows_per, W)

    # Sequential tiles bound peak memory; the raster is memory-bound on the
    # materialized (pixels × tri-block) edge-function buffers either way —
    # a Pallas kernel keeping the tile z-buffer in VMEM is the round-2 fix
    # (ROADMAP.md). vmap over tiles was measured 1.7× slower (more traffic).
    depth, tid = jax.lax.map(tile_fn, jnp.arange(ntile))
    depth = depth.reshape(ntile * rows_per, W)[:H]
    tid = tid.reshape(ntile * rows_per, W)[:H]
    tid = jnp.where(tid >= T, -1, tid)  # padded tris never win, but be safe
    return depth, tid


@functools.partial(
    jax.jit, static_argnames=("W", "H", "shadow_size", "cfg", "wireframe")
)
def render_scene(
    tris_world: jax.Array,
    valid: jax.Array,
    colors: jax.Array,
    cam_vp: jax.Array,
    light_vp: jax.Array,
    light_dir: jax.Array,
    W: int = 512,
    H: int = 512,
    shadow_size: int = 1024,
    cfg=None,
    wireframe: bool = False,
):
    """Full two-pass frame. colors: (T, 3) per-triangle base color.

    Returns (image (H, W, 3) f32 in [0,1], depth (H, W))."""
    ambient = 0.08 if cfg is None else cfg.ambient
    bias = 2e-3 if cfg is None else cfg.depth_bias

    # Pass 1: shadow depth.
    sdepth, _ = rasterize_ids(
        tris_world, valid, light_vp, shadow_size, shadow_size
    )
    # Pass 2: camera depth + ids.
    depth, tid = rasterize_ids(tris_world, valid, cam_vp, W, H)
    hit = tid >= 0
    t = jnp.clip(tid, 0, tris_world.shape[0] - 1)

    # Recover per-pixel world position via screen barycentrics.
    tri = tris_world[t]                                 # (H, W, 3, 3)
    clip = _project(tris_world, cam_vp)
    sx, sy, sz, inv_w = _screen(clip, W, H)
    ax, ay = sx[t][..., 0], sy[t][..., 0]
    bx, by = sx[t][..., 1], sy[t][..., 1]
    cx, cy = sx[t][..., 2], sy[t][..., 2]
    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    w0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
    w1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
    w2 = 1.0 - w0 - w1
    # Perspective-correct world position.
    iw = inv_w[t]                                       # (H, W, 3)
    denom = w0 * iw[..., 0] + w1 * iw[..., 1] + w2 * iw[..., 2]
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    wpos = (
        tri[..., 0, :] * (w0 * iw[..., 0])[..., None]
        + tri[..., 1, :] * (w1 * iw[..., 1])[..., None]
        + tri[..., 2, :] * (w2 * iw[..., 2])[..., None]
    ) / denom[..., None]

    # Flat face normal.
    n = jnp.cross(
        tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :]
    )
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ldir = -jnp.asarray(light_dir, jnp.float32)
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-12)
    diffuse = jnp.maximum(jnp.sum(n * ldir, axis=-1), 0.0)

    # Shadow factor: 3×3 PCF (9-tap, Shader.hlsli:97-126). Normal-offset +
    # slope-scaled bias suppresses acne on grazing faces.
    slope = 1.0 / jnp.maximum(
        jnp.abs(jnp.sum(n * ldir, axis=-1)), 0.15
    )
    ones = jnp.ones(wpos.shape[:-1] + (1,), wpos.dtype)
    lclip = jnp.einsum("ij,hwj->hwi", light_vp, jnp.concatenate([wpos, ones], -1))
    lx = (lclip[..., 0] + 1.0) * 0.5 * shadow_size
    ly = (1.0 - lclip[..., 1]) * 0.5 * shadow_size
    lz = lclip[..., 2]
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ix = jnp.clip(lx.astype(jnp.int32) + dx, 0, shadow_size - 1)
            iy = jnp.clip(ly.astype(jnp.int32) + dy, 0, shadow_size - 1)
            sd = sdepth[iy, ix]
            taps.append((lz - bias * slope <= sd).astype(jnp.float32))
    shadow = sum(taps) / 9.0

    base = colors[t]
    lit = base * (ambient + diffuse * shadow)[..., None]
    if wireframe:
        # Edge overlay from screen barycentrics (the analogue of the
        # reference's wireframe PSOs, Surtr.cpp:1010-1032).
        edge = jnp.minimum(jnp.minimum(w0, w1), w2)
        lit = jnp.where((edge < 0.03)[..., None], lit * 0.15, lit)
    bg = jnp.asarray([0.12, 0.15, 0.18], jnp.float32)
    img = jnp.where(hit[..., None], lit, bg)
    return jnp.clip(img, 0.0, 1.0), depth
