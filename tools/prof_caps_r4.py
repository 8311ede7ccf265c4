import time, sys
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pipeline import prepare_fracture
from surtr_tpu.io.models import get_model, sphere_point_cloud

def timeit(fn, *a, warmup=2, iters=5):
    for _ in range(warmup):
        out = fn(*a); jax.tree_util.tree_leaves(out)[0].block_until_ready()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))

v, f = get_model("cube")
verts = jnp.asarray(v); corners = jnp.asarray(v[f])
vm = jnp.ones(len(v), bool); tm = jnp.ones(len(f), bool)
cloud = jnp.asarray(sphere_point_cloud())
key = jax.random.PRNGKey(46354)
REP = 16

for exact in (False, True):
    cfg = FractureConfig(
        initial_decompose_cell_cnt=1024, max_pieces=1024, max_faces=26,
        max_face_verts=16, max_piece_tris=64, voronoi_neighbors=48,
        voronoi_prefix=24, partial_pattern_cell_cnt=8,
        general_pattern_cell_cnt=8, exact_caps=exact,
    )
    @jax.jit
    def run_many(keys):
        def body(c, k):
            pieces, ctx, met = prepare_fracture(verts, vm, corners, tm, cloud, k, cfg)
            return c + jnp.sum(pieces.valid), met["total_volume"]
        return jax.lax.scan(body, jnp.int32(0), keys)
    keys = jax.random.split(key, REP)
    t0=time.time()
    ms = timeit(run_many, keys) / REP
    print(f"decomp_1k exact_caps={exact}: {ms:.2f} ms/event (compile+bench {time.time()-t0:.0f}s)", flush=True)
