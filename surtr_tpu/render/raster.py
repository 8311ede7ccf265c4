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


W_EPS = 1e-4


def _near_clip_full(clip: jax.Array, valid: jax.Array, aux: jax.Array):
    """Clip triangles against the near plane w > W_EPS in clip space.

    A triangle with 1-2 vertices behind the eye is cut into 1-2 smaller
    triangles instead of being culled whole (the round-1 rasterizer dropped
    such triangles, which forced the ground plane to be tessellated into
    hundreds of small quads — scene.py's old workaround).

    ``aux`` carries extra per-vertex attributes (e.g. world positions)
    lerped with the same parameter — valid because the projective map is
    linear in homogeneous coordinates.

    clip: (T, 3, 4); valid: (T,); aux: (T, 3, D).
    Returns ((2T, 3, 4), (2T, 3, D), (2T,) valid).
    """
    w = clip[..., 3]                                      # (T, 3)
    inside = w > W_EPS
    n_in = jnp.sum(inside.astype(jnp.int32), axis=-1)

    v = jnp.concatenate([clip, aux], axis=-1)             # (T, 3, 4+D)
    r0 = v
    r1 = v[:, jnp.array([1, 2, 0])]
    r2 = v[:, jnp.array([2, 0, 1])]
    i0, i1, i2 = inside[:, 0], inside[:, 1], inside[:, 2]
    ins = [
        (i0, i1, i2),
        (i1, i2, i0),
        (i2, i0, i1),
    ]
    # Canonical rotation: 1-in → inside vertex at slot 0;
    #                     2-in → outside vertex at slot 2.
    want1 = [a & ~b & ~c for (a, b, c) in ins]
    want2 = [a & b & ~c for (a, b, c) in ins]
    sel1 = jnp.where(want1[0], 0, jnp.where(want1[1], 1, 2))
    sel2 = jnp.where(want2[0], 0, jnp.where(want2[1], 1, 2))
    sel = jnp.where(n_in == 1, sel1, sel2)
    rot = jnp.where(
        (sel == 0)[:, None, None], r0,
        jnp.where((sel == 1)[:, None, None], r1, r2),
    )                                                     # (T, 3, 4+D)
    A, B, C = rot[:, 0], rot[:, 1], rot[:, 2]

    def lerp_w(P, Q):
        t = (P[:, 3] - W_EPS) / jnp.where(
            jnp.abs(P[:, 3] - Q[:, 3]) > 1e-12, P[:, 3] - Q[:, 3], 1.0
        )
        t = jnp.clip(t, 0.0, 1.0)[:, None]
        return P + t * (Q - P)

    # 1-in (A in; B, C out): (A, AB, AC).
    one_t1 = jnp.stack([A, lerp_w(A, B), lerp_w(A, C)], axis=1)
    # 2-in (A, B in; C out): (A, B, BC) + (A, BC, CA).
    bc = lerp_w(B, C)
    ca = lerp_w(A, C)
    two_t1 = jnp.stack([A, B, bc], axis=1)
    two_t2 = jnp.stack([A, bc, ca], axis=1)

    t1 = jnp.where(
        (n_in == 3)[:, None, None], v,
        jnp.where((n_in == 1)[:, None, None], one_t1, two_t1),
    )
    v1 = valid & (n_in >= 1)
    t2 = two_t2
    v2 = valid & (n_in == 2)
    out = jnp.concatenate([t1, t2])
    return out[..., :4], out[..., 4:], jnp.concatenate([v1, v2])


def _near_clip_pooled(clip: jax.Array, valid: jax.Array):
    """Near clip with the SECOND sub-triangles compacted into a small pool
    instead of doubling the whole domain: a triangle only emits a second
    piece when exactly two vertices are in front of the near plane, which
    is a handful of triangles per frame — the full 2T domain made every
    downstream raster stage (tile sort, payload gather, binning, chunk
    sweep) pay 2× for rows that are ~all invalid.

    Returns (clip_out (T+TP2, 3, 4), ok_out (T+TP2,), src (T+TP2,) i32
    source-triangle ids for attribute lookup). Pool capacity TP2 = T//8:
    overflow (needs >12.5% of ALL triangles straddling the near plane —
    a degenerate camera) drops the extra piece of the overflowing
    triangles only.
    """
    T = clip.shape[0]
    aux0 = jnp.zeros(clip.shape[:-1] + (0,), clip.dtype)
    c2, _, v2 = _near_clip_full(clip, valid, aux0)
    t1, t2 = c2[:T], c2[T:]
    v1, need2 = v2[:T], v2[T:]
    TP2 = min(T, max(256, T // 8))
    order2 = jnp.argsort(
        jnp.where(need2, 0, 1).astype(jnp.int32), stable=True
    )
    src2 = order2[:TP2].astype(jnp.int32)
    ok2 = need2[src2]
    clip_out = jnp.concatenate([t1, t2[src2]])
    ok_out = jnp.concatenate([v1, ok2])
    src = jnp.concatenate([jnp.arange(T, dtype=jnp.int32), src2])
    return clip_out, ok_out, src


def near_clip(clip: jax.Array, valid: jax.Array):
    """Near-plane clip, clip-space only. Returns ((2T, 3, 4), (2T,))."""
    c2, _, v2 = _near_clip_full(
        clip, valid, jnp.zeros(clip.shape[:-1] + (0,), clip.dtype)
    )
    return c2, v2


def _use_pallas_default() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) in ("tpu", "axon")
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit,
    static_argnames=(
        "W", "H", "tile_rows", "tri_block", "use_pallas", "ortho"
    ),
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
    ortho: bool = False,
):
    """Z-buffer rasterization with near-plane clipping. Returns
    (depth (H, W), tri_id (H, W) i32 in the CALLER's triangle order;
    -1 = background).

    ``ortho``: the projection has w ≡ 1 (directional-light shadow pass) —
    the near clip is then the identity, so skip it and keep the raster in
    the T domain instead of 2T (halves the shadow pass's sort/binning/glue).
    """
    T = tris_world.shape[0]
    clip = _project(tris_world, mvp)
    if ortho:
        clip2, ok2 = clip, valid
    else:
        clip2, ok2 = near_clip(clip, valid)
    sx, sy, sz, inv_w = _screen(clip2, W, H)           # (2T or T, 3) each
    depth, tid = raster_screen(
        sx, sy, sz, ok2, W, H,
        tile_rows=tile_rows, tri_block=tri_block, use_pallas=use_pallas,
    )
    tid = jnp.where(tid >= 0, tid % T, -1)
    return depth, tid


@functools.partial(
    jax.jit, static_argnames=("W", "H", "tile_rows", "tri_block", "use_pallas")
)
def raster_screen(
    sx, sy, sz, ok, W: int, H: int,
    tile_rows: int = 32, tri_block: int = 512, use_pallas: bool | None = None,
    attr_tab=None,
):
    """Core z-buffer sweep over screen-space triangles (already clipped).

    ``attr_tab`` (T, A): optional per-triangle G-buffer attributes; when
    given, also returns gbuf (H, W, A) = attr_tab[tid] (zeros on
    background). The Pallas kernel selects the winner's attributes
    in-kernel (VMEM one-hot contraction); the jnp path gathers — cheap on
    CPU, and the two agree exactly, keeping the parity tests one-path.
    """
    T = sx.shape[0]
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas and W % 128 == 0 and H % 32 == 0:
        from surtr_tpu.render.raster_pallas import rasterize_ids_pallas

        return rasterize_ids_pallas(sx, sy, sz, ok, W, H, attr_tab=attr_tab)

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
    if attr_tab is not None:
        tab_ext = jnp.concatenate(
            [attr_tab, jnp.zeros((1,) + attr_tab.shape[1:], attr_tab.dtype)]
        )
        gbuf = tab_ext[jnp.where(tid >= 0, tid, T)].astype(jnp.float32)
        return depth, tid, gbuf
    return depth, tid


def _shade_deferred(
    tris_world, colors, cam_vp, light_vp, light_dir,
    depth, tid2, sdepth, W: int, H: int, shadow_size: int,
    ambient: float, bias: float, gbuf=None,
):
    """Flat-shading shading pass from the depth/id buffers alone.

    World positions come from intersecting each pixel's view ray with the
    hit triangle's PLANE: unprojecting the f32 NDC z-buffer amplifies depth
    quantization by ~z²/near, giving unbounded wpos error at far/grazing
    pixels (advisor r3: mean ~16 world units on the ground plane; shadow
    lookups visibly diverged) — the ray-plane form is exact up to the plane
    itself.

    ``gbuf`` (H, W, 7) = per-pixel [n̂ (3), color (3), n̂·v0 (1)] emitted by
    the raster's in-kernel winner selection: the attribute and plane
    per-pixel row gathers this pass used to pay (~2 ms each at 512² on
    this backend) are gone. Without gbuf (CPU path / external callers) the
    gathers remain: ONE bf16 (T, 6) [normal, color] gather + an f32 (T, 4)
    plane gather. The 9-tap PCF stack is quantized to i16 (±5e-5 depth
    error, far below the 2e-3 slope-scaled bias) — halves the dominant
    (H·W, 9) gather's bytes. Semantics match the reference shading path
    (Shader.hlsli:97-145) to quantization.
    """
    T = tris_world.shape[0]
    hit = tid2 >= 0

    if gbuf is not None:
        n = gbuf[..., 0:3]
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12
        )
        base = gbuf[..., 3:6]
        pl = jnp.concatenate([gbuf[..., 0:3], gbuf[..., 6:7]], axis=-1)
    else:
        idx = jnp.clip(tid2, 0, 2 * T - 1) % T
        n_t = jnp.cross(
            tris_world[:, 1] - tris_world[:, 0],
            tris_world[:, 2] - tris_world[:, 0],
        )
        n_t = n_t / jnp.maximum(
            jnp.linalg.norm(n_t, axis=-1, keepdims=True), 1e-12
        )
        table = jnp.concatenate([n_t, colors], axis=1).astype(jnp.bfloat16)
        pa = table[idx].astype(jnp.float32)             # (H, W, 6)
        n = pa[..., 0:3]
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12
        )
        base = pa[..., 3:6]
        # Geometry needs full precision: (n, n·v0) as a separate f32 gather
        # (1 MB extra at 512² — the bf16 normal alone tilts the plane
        # ~0.4%).
        plane_t = jnp.concatenate(
            [n_t, jnp.sum(n_t * tris_world[:, 0], -1, keepdims=True)],
            axis=1,
        )                                               # (T, 4) f32
        pl = plane_t[idx]                               # (H, W, 4)

    # Pixel view rays: unproject NDC z=0 and z=1 once through inv(cam_vp),
    # then intersect with the hit plane — no dependence on the z-buffer.
    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    ndc_x = jnp.broadcast_to(px * (2.0 / W) - 1.0, (H, W))
    ndc_y = jnp.broadcast_to(1.0 - py * (2.0 / H), (H, W))
    inv_vp = jnp.linalg.inv(cam_vp)

    def unproj(zc):
        ndc_h = jnp.stack(
            [ndc_x, ndc_y, jnp.full_like(ndc_x, zc), jnp.ones_like(ndc_x)],
            axis=-1,
        )
        world_h = jnp.einsum("ij,hwj->hwi", inv_vp, ndc_h,
                             precision=jax.lax.Precision.HIGHEST)
        wdiv = world_h[..., 3]
        wdiv = jnp.where(jnp.abs(wdiv) > 1e-12, wdiv, 1.0)
        return world_h[..., :3] / wdiv[..., None]

    x0 = unproj(0.0)
    # Ray direction WITHOUT a second unprojection: the camera center is the
    # preimage of clip [0,0,1,0] (h = inv_vp @ e_z, eye = h₃⁻¹·h[:3] for a
    # perspective map), and the ray-plane form below is invariant to the
    # ray's scale AND sign, so ray = h₃·x0 − h[:3] works for perspective
    # (∝ x0 − eye) and degenerates to the constant view direction −h[:3]
    # for an orthographic camera (h₃ = 0).
    h = inv_vp[:, 2]
    ray = h[3] * x0 - h[:3]
    ndot0 = jnp.sum(pl[..., :3] * x0, -1)
    ndotr = jnp.sum(pl[..., :3] * ray, -1)
    tstar = (pl[..., 3] - ndot0) / jnp.where(
        jnp.abs(ndotr) > 1e-12, ndotr, 1.0
    )
    wpos = x0 + tstar[..., None] * ray

    ldir = -jnp.asarray(light_dir, jnp.float32)
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-12)
    diffuse = jnp.maximum(jnp.sum(n * ldir, axis=-1), 0.0)
    slope = 1.0 / jnp.maximum(jnp.abs(jnp.sum(n * ldir, axis=-1)), 0.15)

    ones = jnp.ones(wpos.shape[:-1] + (1,), wpos.dtype)
    lclip = jnp.einsum(
        "ij,hwj->hwi", light_vp, jnp.concatenate([wpos, ones], -1)
    )
    lx = (lclip[..., 0] + 1.0) * 0.5 * shadow_size
    ly = (1.0 - lclip[..., 1]) * 0.5 * shadow_size
    lz = lclip[..., 2]

    # i16-quantized pre-shifted PCF stack: q = round(clip(v, -1, 2) · 1e4).
    QS = 10000.0
    sq = jnp.round(jnp.clip(sdepth, -1.0, 2.0) * QS).astype(jnp.int16)
    sp = jnp.pad(sq, 1, mode="edge")
    stack = jnp.stack(
        [
            sp[1 + dy : 1 + dy + shadow_size, 1 + dx : 1 + dx + shadow_size]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        axis=-1,
    ).reshape(shadow_size * shadow_size, 9)
    ix = jnp.clip(lx.astype(jnp.int32), 0, shadow_size - 1)
    iy = jnp.clip(ly.astype(jnp.int32), 0, shadow_size - 1)
    sd9 = stack[iy * shadow_size + ix]                  # (H, W, 9) i16
    qlz = jnp.round(
        jnp.clip(lz - bias * slope, -1.0, 2.0) * QS
    ).astype(jnp.int16)
    shadow = jnp.mean((qlz[..., None] <= sd9).astype(jnp.float32), axis=-1)

    lit = base * (ambient + diffuse * shadow)[..., None]
    bg = jnp.asarray([0.12, 0.15, 0.18], jnp.float32)
    img = jnp.where(hit[..., None], lit, bg)
    return jnp.clip(img, 0.0, 1.0), depth


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
    normals=None,
):
    """Full two-pass frame. colors: (T, 3) per-triangle base color;
    normals: optional (T, 3, 3) per-corner normals for smooth (Gouraud-
    normal / per-pixel Phong) shading — the reference imports per-vertex
    normals (VertexNormalColor, Mesh.h:4-13) and shades with them; flat
    per-triangle normals remain the default (fracture cut faces are
    planar). Near-plane-clipped sub-triangles fall back to flat normals.

    Returns (image (H, W, 3) f32 in [0,1], depth (H, W))."""
    ambient = 0.08 if cfg is None else cfg.ambient
    bias = 2e-3 if cfg is None else cfg.depth_bias
    T = tris_world.shape[0]

    # Pass 1: shadow depth (directional light, ortho: w ≡ 1, so the near
    # clip is skipped — the raster stays in the T domain, not 2T).
    sdepth, _ = rasterize_ids(
        tris_world, valid, light_vp, shadow_size, shadow_size, ortho=True
    )
    # Pass 2: camera depth + ids, in the near-clipped 2T domain so partial
    # triangles shade correctly (the clipped sub-triangle's own vertices
    # interpolate; clip-space lerp parameters transfer to world space
    # exactly — the projective map is linear in homogeneous coordinates).
    clip = _project(tris_world, cam_vp)

    if normals is None and not wireframe:
        # Fast deferred path (flat shading — the interactive-loop config).
        # Random row gathers on this backend cost ~ per-row DMA overhead ×
        # bytes (tools/bench_gather.py: (H·W, 24) f32 rows 4.2 ms, 9-lane
        # bf16 2.1, i16 2.3) — the raster emits the winner's [n̂, color,
        # n̂·v0] G-buffer from VMEM instead (raster_pallas in-kernel
        # one-hot contraction; the jnp path gathers, cheap off-TPU), and
        # the world position comes from intersecting the pixel ray with
        # the winning plane. Near-clipped second pieces ride a small pool
        # (T+T/8 domain) instead of doubling every raster stage to 2T.
        clip_p, ok_p, src_p = _near_clip_pooled(clip, valid)
        sxp, syp, szp, _ = _screen(clip_p, W, H)
        n_t = jnp.cross(
            tris_world[:, 1] - tris_world[:, 0],
            tris_world[:, 2] - tris_world[:, 0],
        )
        n_t = n_t / jnp.maximum(
            jnp.linalg.norm(n_t, axis=-1, keepdims=True), 1e-12
        )
        d_t = jnp.sum(n_t * tris_world[:, 0], axis=-1, keepdims=True)
        attr_tab = jnp.concatenate([n_t, colors, d_t], axis=1)[src_p]
        depth, tid2, gbuf = raster_screen(
            sxp, syp, szp, ok_p, W, H, attr_tab=attr_tab
        )
        return _shade_deferred(
            tris_world, colors, cam_vp, light_vp, light_dir,
            depth, tid2, sdepth, W, H, shadow_size, ambient, bias,
            gbuf=gbuf,
        )

    clip2, world2, ok2 = _near_clip_full(clip, valid, tris_world)
    sx, sy, sz, inv_w = _screen(clip2, W, H)            # (2T, 3)
    depth, tid2 = raster_screen(sx, sy, sz, ok2, W, H)
    hit = tid2 >= 0
    t2 = jnp.clip(tid2, 0, 2 * T - 1)

    # Per-tri attributes in the 2T domain, fetched with ONE packed gather
    # (separate row gathers cost ~ms each on this backend).
    n_t = jnp.cross(
        tris_world[:, 1] - tris_world[:, 0],
        tris_world[:, 2] - tris_world[:, 0],
    )
    n_t = n_t / jnp.maximum(
        jnp.linalg.norm(n_t, axis=-1, keepdims=True), 1e-12
    )
    parts = [
        world2.reshape(2 * T, 9),
        sx, sy, inv_w,
        jnp.tile(n_t, (2, 1)),
        jnp.tile(colors, (2, 1)),
    ]
    if normals is not None:
        # Per-corner normals; the near-clip's extra T sub-triangles reuse
        # the flat normal at every corner (clip-edge cases only).
        flat3 = jnp.tile(n_t[:, None, :], (1, 3, 1))
        parts.append(
            jnp.concatenate([normals, flat3]).reshape(2 * T, 9)
        )
    attrs = jnp.concatenate(parts, axis=1)              # (2T, 24[+9])
    pa = attrs[t2]                                      # (H, W, 24[+9])
    tri = pa[..., 0:9].reshape(pa.shape[:-1] + (3, 3))
    ax, bx, cx = pa[..., 9], pa[..., 10], pa[..., 11]
    ay, by, cy = pa[..., 12], pa[..., 13], pa[..., 14]
    iw = pa[..., 15:18]
    n = pa[..., 18:21]
    base = pa[..., 21:24]

    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    w0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
    w1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
    w2 = 1.0 - w0 - w1
    denom = w0 * iw[..., 0] + w1 * iw[..., 1] + w2 * iw[..., 2]
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    wpos = (
        tri[..., 0, :] * (w0 * iw[..., 0])[..., None]
        + tri[..., 1, :] * (w1 * iw[..., 1])[..., None]
        + tri[..., 2, :] * (w2 * iw[..., 2])[..., None]
    ) / denom[..., None]

    if normals is not None:
        # Perspective-correct normal interpolation at the pixel.
        vn = pa[..., 24:33].reshape(pa.shape[:-1] + (3, 3))
        n_px = (
            vn[..., 0, :] * (w0 * iw[..., 0])[..., None]
            + vn[..., 1, :] * (w1 * iw[..., 1])[..., None]
            + vn[..., 2, :] * (w2 * iw[..., 2])[..., None]
        ) / denom[..., None]
        n = n_px / jnp.maximum(
            jnp.linalg.norm(n_px, axis=-1, keepdims=True), 1e-12
        )

    ldir = -jnp.asarray(light_dir, jnp.float32)
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-12)
    diffuse = jnp.maximum(jnp.sum(n * ldir, axis=-1), 0.0)

    # Shadow factor: 3×3 PCF (9-tap, Shader.hlsli:97-126). Normal-offset +
    # slope-scaled bias suppresses acne on grazing faces. The 9 taps come
    # from ONE gather of a pre-shifted (Hs·Ws, 9) shadow stack — 9 separate
    # dynamic gathers cost ~ms each here.
    slope = 1.0 / jnp.maximum(
        jnp.abs(jnp.sum(n * ldir, axis=-1)), 0.15
    )
    ones = jnp.ones(wpos.shape[:-1] + (1,), wpos.dtype)
    lclip = jnp.einsum("ij,hwj->hwi", light_vp, jnp.concatenate([wpos, ones], -1))
    lx = (lclip[..., 0] + 1.0) * 0.5 * shadow_size
    ly = (1.0 - lclip[..., 1]) * 0.5 * shadow_size
    lz = lclip[..., 2]
    sp = jnp.pad(sdepth, 1, mode="edge")                # (Hs+2, Ws+2)
    stack = jnp.stack(
        [
            sp[1 + dy : 1 + dy + shadow_size, 1 + dx : 1 + dx + shadow_size]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        axis=-1,
    ).reshape(shadow_size * shadow_size, 9)
    ix = jnp.clip(lx.astype(jnp.int32), 0, shadow_size - 1)
    iy = jnp.clip(ly.astype(jnp.int32), 0, shadow_size - 1)
    sd9 = stack[iy * shadow_size + ix]                  # (H, W, 9)
    shadow = jnp.mean(
        (lz[..., None] - bias * slope[..., None] <= sd9).astype(jnp.float32),
        axis=-1,
    )
    lit = base * (ambient + diffuse * shadow)[..., None]
    if wireframe:
        # Edge overlay from screen barycentrics (the analogue of the
        # reference's wireframe PSOs, Surtr.cpp:1010-1032).
        edge = jnp.minimum(jnp.minimum(w0, w1), w2)
        lit = jnp.where((edge < 0.03)[..., None], lit * 0.15, lit)
    bg = jnp.asarray([0.12, 0.15, 0.18], jnp.float32)
    img = jnp.where(hit[..., None], lit, bg)
    return jnp.clip(img, 0.0, 1.0), depth
