"""Isolated TPU timing of the broadphase paths at 10k pieces.

Times the production physics step end-to-end under each broadphase mode
(MODES env, default sorted + exact_pallas) on the bench's 10k-pile
workload, plus the exact-sweep kernel solo on the same lattice AABBs.
"""
import sys, time, os

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import dataclasses

from bench import timeit  # repo-root bench.py


def build_pile(n=10_000):
    from surtr_tpu.config import PhysicsConfig
    from surtr_tpu.fracture.types import PieceSet
    from surtr_tpu.physics.scene import build_scene
    from surtr_tpu.types import ConvexPoly, translate_poly, unit_cube

    pcfg = PhysicsConfig(single_piece_bodies=True, max_hull_verts=8)
    side = int(round(n ** (1 / 3)))
    while side * side * side < n:
        side += 1
    idx = np.arange(side**3)[:n]
    xs = np.stack(
        [idx % side, (idx // side) % side, idx // (side * side)], axis=1
    ).astype(np.float32)
    offsets = xs * 1.02 + np.array([-side / 2, -1.45, -side / 2])

    cube = unit_cube(F=8, S=8)
    conv = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), cube
    )
    conv = translate_poly(conv, jnp.zeros(3))
    fv = conv.face_verts + jnp.asarray(offsets)[:, None, None, :]
    d = conv.planes[..., 3:4] - jnp.sum(
        conv.planes[..., :3] * jnp.asarray(offsets)[:, None, :],
        -1, keepdims=True,
    )
    conv = ConvexPoly(
        fv, conv.n_verts, jnp.concatenate([conv.planes[..., :3], d], -1)
    )
    pieces = PieceSet(
        convex=conv,
        mesh=jnp.zeros((n, 1, 3, 3)),
        mesh_valid=jnp.zeros((n, 1), bool),
        valid=jnp.ones((n,), bool),
        group=jnp.arange(n, dtype=jnp.int32),
        tag=jnp.full((n,), -1, jnp.int32),
    )
    return build_scene(pieces, pcfg, max_bodies=n), pcfg, offsets


def main():
    from surtr_tpu.physics.step import physics_step
    from surtr_tpu.physics.broadphase_pallas import broadphase_exact_pallas

    scene, cfg0, offsets = build_pile()
    REP = 64
    variants = []
    for mode in os.environ.get("MODES", "sorted,exact_pallas").split(","):
        variants.append((mode, dataclasses.replace(cfg0, broadphase=mode)))
    if os.environ.get("NOWAKE", "1") == "1":
        variants.append(
            ("sorted/wake_hops=0",
             dataclasses.replace(cfg0, broadphase="sorted", wake_hops=0)))
    for mode, cfg in variants:

        @jax.jit
        def run(s, _cfg=cfg):
            out = jax.lax.scan(
                lambda c, _: (physics_step(c, _cfg), None),
                s, None, length=REP,
            )[0]
            return out.bodies.x

        t0 = time.time()
        ms = timeit(run, scene, warmup=3, iters=8) / REP
        print(f"physics_10k[{mode}]: {ms:.2f} ms/step "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)

    # Kernel solo on the same lattice's AABBs (0.51 half-extent ≈ the
    # fattened k-DOP boxes), scanned REP times to amortize dispatch.
    n = offsets.shape[0]
    centers = jnp.asarray(offsets)
    half = jnp.full((n, 3), 0.51)
    lo, hi = centers - half, centers + half
    owner = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones((n,), bool)

    @jax.jit
    def solo(c, l, h, o, v):
        def body(acc, _):
            pidx, pok, mut = broadphase_exact_pallas(c, l, h, o, v, 8)
            from surtr_tpu.physics.broadphase_pallas import apply_theta_mutual
            pok = apply_theta_mutual(pidx, pok, mut)
            return acc + jnp.sum(pidx * pok), None
        return jax.lax.scan(body, jnp.int32(0), None, length=REP)[0]

    ms = timeit(solo, centers, lo, hi, owner, valid) / REP
    print(f"exact_pallas kernel solo: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
