"""Serial round-4 TPU measurements: caps cost, pumpkin, physics_10k."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")

# 1. physics_10k solo (exact_pallas broadphase default now)
ms = bench.bench_physics_10k()
print(f"physics_10k: {ms:.2f} ms/step", flush=True)

# 2. decomp_1k cube with exact caps ON vs the bench default (off)
from surtr_tpu.config import FractureConfig
from surtr_tpu.fracture.pipeline import prepare_fracture
from surtr_tpu.io.models import get_model, sphere_point_cloud

def decomp(exact):
    cfg = FractureConfig(
        initial_decompose_cell_cnt=1024, max_pieces=1024, max_faces=26,
        max_face_verts=16, max_piece_tris=64, voronoi_neighbors=48,
        voronoi_prefix=24, partial_pattern_cell_cnt=8,
        general_pattern_cell_cnt=8, exact_caps=exact,
    )
    v, f = get_model("cube")
    verts = jnp.asarray(v); corners = jnp.asarray(v[f])
    vm = jnp.ones(len(v), bool); tm = jnp.ones(len(f), bool)
    cloud = jnp.asarray(sphere_point_cloud())
    REP = 16
    keys = jax.random.split(jax.random.PRNGKey(46354), REP)
    @jax.jit
    def run_many(keys):
        def body(c, k):
            pieces, ctx, met = prepare_fracture(verts, vm, corners, tm, cloud, k, cfg)
            return c + jnp.sum(pieces.valid), None
        return jax.lax.scan(body, jnp.int32(0), keys)[0]
    return bench.timeit(run_many, keys) / REP

print(f"decomp_1k exact_caps=False: {decomp(False):.2f} ms/event", flush=True)
print(f"decomp_1k exact_caps=True:  {decomp(True):.2f} ms/event", flush=True)

# 3. pumpkin with exact caps (the model-scale honesty number)
ms, tris, pieces = bench.bench_decomposition_1k_model("pumpkin")
print(f"decomp_1k_pumpkin (exact caps default): {ms:.2f} ms/event", flush=True)
