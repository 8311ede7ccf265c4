"""Micro-split of caps phase-1 at pumpkin dims: which op owns the 33 ms."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from surtr_tpu.config import FractureConfig
from surtr_tpu.ops.caps import match_cut_faces
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

N, F, S, Tp, CF, K = 1088, 96, 32, 128, 16, 54
rng = np.random.default_rng(0)
box = scale_poly(unit_cube(F=F, S=S), 3.0)
conv = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), box
)
pl_ = jnp.asarray(rng.normal(size=(N, K, 4)).astype(np.float32))
pl_ = pl_.at[:, :6].set(jnp.broadcast_to(box.planes[:6][None], (N, 6, 4)))
pm = jnp.ones((N, K), bool)
mt = jnp.asarray(rng.normal(size=(N, Tp, 3, 3)).astype(np.float32))
mm = jnp.ones((N, Tp), bool)
mas = jnp.float32(3.0)

@jax.jit
def f_match(conv, pl_, pm):
    return match_cut_faces(conv, pl_, pm, mas)

@jax.jit
def f_oh(conv, pl_, pm):
    cut_sel = match_cut_faces(conv, pl_, pm, mas)
    pos = jnp.cumsum(cut_sel.astype(jnp.int32), -1) - cut_sel.astype(jnp.int32)
    oh = (
        cut_sel[:, None, :] & (pos[:, None, :] == jnp.arange(CF)[None, :, None])
    ).astype(jnp.float32)
    return oh

def contractions(oh, conv):
    loops = jnp.sum(
        oh[:, :, :, None, None] * conv.face_verts[:, None], axis=2
    )
    nv = jnp.sum(oh * conv.n_verts[:, None].astype(oh.dtype), axis=2)
    pls = jnp.sum(oh[:, :, :, None] * conv.planes[:, None], axis=2)
    return loops, nv, pls

@jax.jit
def f_contr(conv, pl_, pm):
    return contractions(f_oh(conv, pl_, pm), conv)

@jax.jit
def f_contr_mxu(conv, pl_, pm):
    oh = f_oh(conv, pl_, pm)
    fv = conv.face_verts.reshape(N, F, S * 3)
    loops = jax.lax.dot_general(
        oh, fv, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(N, CF, S, 3)
    aux = jnp.concatenate(
        [conv.planes, conv.n_verts[..., None].astype(jnp.float32)], -1
    )
    pn = jax.lax.dot_general(
        oh, aux, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )
    return loops, pn

@jax.jit
def f_dv(conv, pl_, pm):
    _, _, pls = contractions(f_oh(conv, pl_, pm), conv)
    dv = (
        pls[:, :, None, None, 0] * mt[:, None, :, :, 0]
        + pls[:, :, None, None, 1] * mt[:, None, :, :, 1]
        + pls[:, :, None, None, 2] * mt[:, None, :, :, 2]
        + pls[:, :, 3, None, None]
    )
    tol_on = 1e-5 * jnp.maximum(mas, 1.0)
    on = jnp.abs(dv) < tol_on
    all_on = jnp.all(on, axis=-1)
    nxt = jnp.array([1, 2, 0])
    e_on = on & on[..., nxt] & mm[:, None, :, None] & ~all_on[..., None]
    return e_on

print(f"match_cut_faces: {timeit(f_match, conv, pl_, pm):.2f} ms", flush=True)
print(f"+one-hot build:  {timeit(f_oh, conv, pl_, pm):.2f} ms", flush=True)
print(f"+contractions (bcast): {timeit(f_contr, conv, pl_, pm):.2f} ms", flush=True)
print(f"+contractions (MXU):   {timeit(f_contr_mxu, conv, pl_, pm):.2f} ms", flush=True)
print(f"+dv/e_on masks:  {timeit(f_dv, conv, pl_, pm):.2f} ms", flush=True)
