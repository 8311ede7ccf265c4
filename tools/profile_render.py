#!/usr/bin/env python
"""Isolate render_scene stage costs on the current backend.

Stages timed independently (each its own jitted scan, REP-amortized):
  shadow    — depth-only raster at shadow_size²
  camera    — near-clip + raster at W×H
  gather    — winning-id attribute gather + barycentric recompute
  shade     — lighting + PCF (9-tap pre-shifted stack gather)
  full      — render_scene end-to-end

Run: python tools/profile_render.py [shadow_size]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from surtr_tpu.render.camera import light_view_proj, look_at, perspective
from surtr_tpu.render import raster as R

SIZE = 512
SHADOW = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REP = 16


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, iters=5):
    for _ in range(2):
        fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) / REP


def scan_wrap(body):
    @jax.jit
    def run(t):
        def f(c, _):
            return c + body(t + c * 0), None
        return jax.lax.scan(f, jnp.float32(0), None, length=REP)[0]
    return run


def main():
    rng = np.random.default_rng(0)
    T = 4096
    centers = rng.uniform(-4, 4, (T, 1, 3)).astype(np.float32)
    tris = jnp.asarray(centers + rng.normal(0, 0.3, (T, 3, 3)).astype(np.float32))
    valid = jnp.ones((T,), bool)
    colors = jnp.full((T, 3), 0.5)
    cam = perspective(45, 1.0, 0.1, 100) @ look_at((8, 6, 8), (0, 0, 0))
    ldir = jnp.asarray([-0.4, -1.0, -0.3])
    lvp = light_view_proj(ldir, (0, 0, 0), 8.0)

    def shadow_only(t):
        d, _ = R.rasterize_ids(t, valid, lvp, SHADOW, SHADOW)
        return jnp.sum(d[::64, ::64])

    def camera_only(t):
        clip = R._project(t, cam)
        clip2, world2, ok2 = R._near_clip_full(clip, valid, t)
        sx, sy, sz, inv_w = R._screen(clip2, SIZE, SIZE)
        depth, tid2 = R.raster_screen(sx, sy, sz, ok2, SIZE, SIZE)
        return jnp.sum(depth[::64, ::64]) + jnp.sum(tid2[::64, ::64])

    def full(t):
        img, _ = R.render_scene(
            t, valid, colors, cam, lvp, ldir,
            W=SIZE, H=SIZE, shadow_size=SHADOW,
        )
        return jnp.sum(img[::64, ::64])

    # Shading sub-stages: replicate render_scene internals with truncation.
    def shade_stage(stage):
        def fn(t):
            W = H = SIZE
            T = t.shape[0]
            sdepth, _ = R.rasterize_ids(t, valid, lvp, SHADOW, SHADOW)
            clip = R._project(t, cam)
            clip2, world2, ok2 = R._near_clip_full(clip, valid, t)
            sx, sy, sz, inv_w = R._screen(clip2, W, H)
            depth, tid2 = R.raster_screen(sx, sy, sz, ok2, W, H)
            hit = tid2 >= 0
            t2 = jnp.clip(tid2, 0, 2 * T - 1)
            n_t = jnp.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
            n_t = n_t / jnp.maximum(
                jnp.linalg.norm(n_t, axis=-1, keepdims=True), 1e-12)
            parts = [world2.reshape(2 * T, 9), sx, sy, inv_w,
                     jnp.tile(n_t, (2, 1)), jnp.tile(colors, (2, 1))]
            attrs = jnp.concatenate(parts, axis=1)
            pa = attrs[t2]
            if stage == 0:  # attrs gather only
                return jnp.sum(pa[::64, ::64, 0]) + jnp.sum(sdepth[::64, ::64])
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
            wpos = (tri[..., 0, :] * (w0 * iw[..., 0])[..., None]
                    + tri[..., 1, :] * (w1 * iw[..., 1])[..., None]
                    + tri[..., 2, :] * (w2 * iw[..., 2])[..., None]
                    ) / denom[..., None]
            if stage == 1:  # + barycentric wpos
                return jnp.sum(wpos[::64, ::64, 0]) + jnp.sum(sdepth[::64, ::64])
            ldirn = -jnp.asarray(ldir, jnp.float32)
            ldirn = ldirn / jnp.maximum(jnp.linalg.norm(ldirn), 1e-12)
            diffuse = jnp.maximum(jnp.sum(n * ldirn, axis=-1), 0.0)
            slope = 1.0 / jnp.maximum(jnp.abs(jnp.sum(n * ldirn, -1)), 0.15)
            ones = jnp.ones(wpos.shape[:-1] + (1,), wpos.dtype)
            lclip = jnp.einsum("ij,hwj->hwi", lvp,
                               jnp.concatenate([wpos, ones], -1))
            lx = (lclip[..., 0] + 1.0) * 0.5 * SHADOW
            ly = (1.0 - lclip[..., 1]) * 0.5 * SHADOW
            lz = lclip[..., 2]
            if stage == 2:  # + light projection
                return jnp.sum(lz[::64, ::64]) + jnp.sum(sdepth[::64, ::64])
            sp = jnp.pad(sdepth, 1, mode="edge")
            stack9 = jnp.stack(
                [sp[1 + dy: 1 + dy + SHADOW, 1 + dx: 1 + dx + SHADOW]
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                axis=-1,
            ).reshape(SHADOW * SHADOW, 9)
            if stage == 3:  # + PCF stack build
                return jnp.sum(stack9[::9999, :]) + jnp.sum(lz[::64, ::64])
            ix = jnp.clip(lx.astype(jnp.int32), 0, SHADOW - 1)
            iy = jnp.clip(ly.astype(jnp.int32), 0, SHADOW - 1)
            sd9 = stack9[iy * SHADOW + ix]
            shadow = jnp.mean(
                (lz[..., None] - 2e-3 * slope[..., None] <= sd9
                 ).astype(jnp.float32), axis=-1)
            lit = base * (0.08 + diffuse * shadow)[..., None]
            bg = jnp.asarray([0.12, 0.15, 0.18], jnp.float32)
            img = jnp.where(hit[..., None], lit, bg)
            return jnp.sum(img[::64, ::64])
        return fn

    print(f"backend={jax.default_backend()} shadow={SHADOW}", flush=True)
    for name, fn in [
        ("shadow", shadow_only),
        ("camera", camera_only),
        ("sh:gather", shade_stage(0)),
        ("sh:bary", shade_stage(1)),
        ("sh:lproj", shade_stage(2)),
        ("sh:stack", shade_stage(3)),
        ("sh:full", shade_stage(4)),
        ("full", full),
    ]:
        ms = timeit(scan_wrap(fn), tris)
        print(f"{name:10s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
