"""Phase timing of the exact-caps machinery at decomp_1k shapes (TPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from surtr_tpu.config import FractureConfig
from surtr_tpu.io.models import get_model
from surtr_tpu.ops.caps import _cap_candidates_one
from surtr_tpu.ops.mesh_clip import winding_inside
from surtr_tpu.types import unit_cube, scale_poly
from surtr_tpu.ops.clip_pallas import clip_planes_batch

def timeit(fn, *a, warmup=2, iters=5):
    for _ in range(warmup):
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))

cfg = FractureConfig(max_faces=26, max_face_verts=16, max_piece_tris=64)
N = 1088
rng = np.random.default_rng(0)
# Representative shapes: random small convex candidates + random soup.
box = scale_poly(unit_cube(F=26, S=16), 3.0)
conv = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a[None], (N,)+a.shape), box)
# random cut planes per candidate (some match faces, most won't — upper bound ok)
K = 32
pl = jnp.asarray(rng.normal(size=(N, K, 4)).astype(np.float32))
pm = jnp.ones((N, K), bool)
# make half the planes actual conv faces so cut_sel fires
pl = pl.at[:, :6].set(jnp.broadcast_to(box.planes[:6][None], (N, 6, 4)))
mt = jnp.asarray(rng.normal(size=(N, 64, 3, 3)).astype(np.float32))
mm = jnp.ones((N, 64), bool)
v, f = get_model("cube")
solid_t = jnp.broadcast_to(jnp.asarray(v[f])[None], (N, len(f), 3, 3))
solid_m = jnp.ones((N, len(f)), bool)
mas = jnp.float32(3.0)

import functools
@functools.partial(jax.jit, static_argnames=("stage",))
def phase1(conv, mt, mm, pl, pm, stage=99):
    cc = jax.vmap(lambda cv, a, b, c, d: _cap_candidates_one(cv, a, b, c, d, mas, cfg, profile_stage=stage))(conv, mt, mm, pl, pm)
    if stage < 99:
        return cc["_p"]
    return cc["rec"], cc["flag"]

from surtr_tpu.ops.caps import cap_fans_batch
@jax.jit
def full(conv, mt, mm, pl, pm, solid_t, solid_m):
    return cap_fans_batch(conv, mt, mm, pl, pm, solid_t, solid_m, mas, cfg)[4]

for st in (1, 2, 3, 4):
    print(f"phase1 stage<={st}:", timeit(functools.partial(phase1, stage=st), conv, mt, mm, pl, pm), "ms", flush=True)
print("phase1 (geometry):", timeit(phase1, conv, mt, mm, pl, pm), "ms", flush=True)
print("full:", timeit(full, conv, mt, mm, pl, pm, solid_t, solid_m), "ms", flush=True)
