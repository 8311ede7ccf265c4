"""Phase timing of the exact-caps machinery at PUMPKIN decomp shapes (TPU).

Splits the 135 ms finish stage: candidate geometry phases 1-4, the
parity-grid probe query (the 9.5M-point gather), assemble, and the
refit+clip tail — each isolated with its own jit + fence.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from surtr_tpu.config import FractureConfig
from surtr_tpu.io.models import get_model
from surtr_tpu.ops.caps import _cap_candidates_one, cap_fans_batch
from surtr_tpu.ops.mesh_clip import build_parity_grid, parity_grid_inside
from surtr_tpu.types import unit_cube, scale_poly

def timeit(fn, *a, warmup=2, iters=5):
    for _ in range(warmup):
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))

cfg = FractureConfig(max_faces=96, max_face_verts=32, max_piece_tris=128)
N = 1088
Tp = 128
rng = np.random.default_rng(0)
box = scale_poly(unit_cube(F=96, S=32), 3.0)
conv = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), box
)
K = 54
pl_ = jnp.asarray(rng.normal(size=(N, K, 4)).astype(np.float32))
pm = jnp.ones((N, K), bool)
pl_ = pl_.at[:, :6].set(jnp.broadcast_to(box.planes[:6][None], (N, 6, 4)))
mt = jnp.asarray(rng.normal(size=(N, Tp, 3, 3)).astype(np.float32))
mm = jnp.ones((N, Tp), bool)
v, f = get_model("pumpkin")
corners = jnp.asarray(v[f])
tmask = jnp.ones((len(f),), bool)
solid_t = jnp.broadcast_to(corners[None], (N,) + corners.shape)
solid_m = jnp.broadcast_to(tmask[None], (N, len(f)))
mas = jnp.float32(3.0)
grid = jax.jit(build_parity_grid, static_argnames=("res",))(corners, tmask)
jax.block_until_ready(grid["inside"])

@functools.partial(jax.jit, static_argnames=("stage",))
def phase1(conv, mt, mm, pl_, pm, stage=99):
    cc = jax.vmap(
        lambda cv, a, b, c, d: _cap_candidates_one(
            cv, a, b, c, d, mas, cfg, profile_stage=stage
        )
    )(conv, mt, mm, pl_, pm)
    if stage < 99:
        return cc["_p"]
    return cc["rec"], cc["flag"]

for st in (1, 2, 3, 4):
    print(f"phase1 stage<={st}: {timeit(functools.partial(phase1, stage=st), conv, mt, mm, pl_, pm):.2f} ms", flush=True)
print(f"phase1 full geometry: {timeit(phase1, conv, mt, mm, pl_, pm):.2f} ms", flush=True)

# Pure grid probe query at the real probe count.
P = 16 * (48 + 32 * 7) * 2  # CF*(NA + S*(X+1))*2 per candidate
probes = jnp.asarray(rng.uniform(-3, 3, (N, P, 3)).astype(np.float32))

@jax.jit
def grid_query(probes):
    return parity_grid_inside(grid, probes.reshape(-1, 3))

print(f"grid probe query ({N*P/1e6:.1f}M pts): {timeit(grid_query, probes):.2f} ms", flush=True)

# Full cap_fans_batch with the grid (the production prepare path).
@jax.jit
def full(conv, mt, mm, pl_, pm):
    return cap_fans_batch(
        conv, mt, mm, pl_, pm, solid_t, solid_m, mas, cfg, solid_grid=grid
    )[4]

print(f"cap_fans_batch full (grid): {timeit(full, conv, mt, mm, pl_, pm):.2f} ms", flush=True)
