"""Round-4 batch 3: warm-solver 10k cost + REP-amortized pumpkin caps split."""
import sys, time, functools, dataclasses
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax._src import compilation_cache as _cc
_cc.zstandard = None
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo/tools")
from prof_broadphase import build_pile
from bench import timeit

from surtr_tpu.physics.step import physics_step

scene, cfg0, _ = build_pile()
REP = 64
for name, kw in [
    ("cold 8/2 (default)", dict()),
    ("warm 4/1", dict(warm_start=True, solver_iters=4, solver_substeps=1)),
    ("cold 4/1", dict(warm_start=False, solver_iters=4, solver_substeps=1)),
]:
    cfg = dataclasses.replace(cfg0, **kw)

    @jax.jit
    def run(s, _cfg=cfg):
        out = jax.lax.scan(
            lambda c, _: (physics_step(c, _cfg), None), s, None, length=REP
        )[0]
        return out.bodies.x

    t0 = time.time()
    ms = timeit(run, scene, warmup=3, iters=8) / REP
    print(f"physics_10k[{name}]: {ms:.2f} ms/step ({time.time()-t0:.0f}s)",
          flush=True)

# REP-amortized caps phases at pumpkin dims.
from surtr_tpu.config import FractureConfig
from surtr_tpu.io.models import get_model
from surtr_tpu.ops.caps import _cap_candidates_one, cap_fans_batch
from surtr_tpu.ops.mesh_clip import build_parity_grid
from surtr_tpu.types import unit_cube, scale_poly

cfg = FractureConfig(max_faces=96, max_face_verts=32, max_piece_tris=128)
N, Tp = 1088, 128
rng = np.random.default_rng(0)
box = scale_poly(unit_cube(F=96, S=32), 3.0)
conv = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), box
)
pl_ = jnp.asarray(rng.normal(size=(N, 54, 4)).astype(np.float32))
pl_ = pl_.at[:, :6].set(jnp.broadcast_to(box.planes[:6][None], (N, 6, 4)))
pm = jnp.ones((N, 54), bool)
mt = jnp.asarray(rng.normal(size=(N, Tp, 3, 3)).astype(np.float32))
mm = jnp.ones((N, Tp), bool)
v, f = get_model("pumpkin")
corners = jnp.asarray(v[f])
solid_t = jnp.broadcast_to(corners[None], (N,) + corners.shape)
solid_m = jnp.ones((N, len(f)), bool)[... ]
mas = jnp.float32(3.0)
grid = jax.jit(build_parity_grid, static_argnames=("res",))(
    corners, jnp.ones((len(f),), bool)
)
jax.block_until_ready(grid["inside"])
CREP = 8

def amort(fn, *a):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*a)
            return c + jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), None, length=CREP)[0]
    return timeit(many, *a) / CREP

for st in (1, 2, 3, 4, 99):
    f_ = lambda cv, a, b, c, d, _st=st: jax.vmap(
        lambda x1, x2, x3, x4, x5: _cap_candidates_one(
            x1, x2, x3, x4, x5, mas, cfg, profile_stage=_st
        )
    )(cv, a, b, c, d)
    print(f"caps phase1 stage<={st}: {amort(f_, conv, mt, mm, pl_, pm):.2f} ms",
          flush=True)

full = lambda: cap_fans_batch(
    conv, mt, mm, pl_, pm, solid_t, solid_m, mas, cfg, solid_grid=grid
)[4]
print(f"caps full (grid): {amort(lambda *a: full()):.2f} ms", flush=True)
