"""Smoke the HBM-streaming trace kernels against a numpy brute force.

Runs on whatever backend is active (real TPU under axon; CPU with
--interpret).  Exercises pallas_stream.closest_hit / any_hit on a wavy-grid
mesh and random rays, comparing hit distances and occlusion flags
hit-for-hit with scalar Moller-Trumbore.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_grid_mesh(g: int):
    xs, zs = np.meshgrid(np.linspace(-5, 5, g + 1), np.linspace(-5, 5, g + 1))
    ys = np.sin(xs) * np.cos(zs)

    def vid(i, j):
        return i * (g + 1) + j

    tris = []
    for i in range(g):
        for j in range(g):
            tris += [(vid(i, j), vid(i + 1, j), vid(i, j + 1)),
                     (vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1))]
    verts = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1).astype(np.float32)
    tris = np.array(tris, np.int32)
    return verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]


def brute_closest(v0, e1, e2, on, dn, tmin=1e-4):
    n = on.shape[0]
    t_ref = np.full(n, np.inf, np.float32)
    for i in range(n):
        h = np.cross(dn[i], e2)
        a = (e1 * h).sum(1)
        mask = np.abs(a) > 1e-9
        inv = np.where(mask, 1.0 / np.where(mask, a, 1.0), 0.0)
        s_ = on[i] - v0
        u = inv * (s_ * h).sum(1)
        q = np.cross(s_, e1)
        v = inv * (dn[i] * q).sum(1)
        t = inv * (e2 * q).sum(1)
        ok = mask & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin)
        if ok.any():
            t_ref[i] = t[ok].min()
    return t_ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--grid", type=int, default=40)
    ap.add_argument("--rays", type=int, default=1024)
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    import spt_tpu.ops.pallas_stream as pst
    from spt_tpu.ops.bvh import build_mesh_accel
    from spt_tpu.ops.vec3 import Vec3

    if args.interpret:
        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        pst.pl.pallas_call = patched

    rng = np.random.RandomState(0)
    v0, v1, v2 = build_grid_mesh(args.grid)
    e1, e2 = v1 - v0, v2 - v0
    print(f"tris {len(v0)}")
    accel = build_mesh_accel(v0, e1, e2, np.zeros(len(v0), np.int32),
                             force_stream=True)
    print(f"clusters {accel.num_clusters} supers {accel.sup_lo.shape[0]}")

    class S:
        pass

    scene = S()
    scene.sph_center = jnp.zeros((1, 3), jnp.float32)
    scene.sph_radius = jnp.zeros((1,), jnp.float32)
    scene.sph_mat = jnp.zeros((1,), jnp.int32)
    scene.num_spheres = 0
    scene.textures = None

    n = args.rays
    o = Vec3(jnp.asarray(rng.uniform(-6, 6, n), jnp.float32),
             jnp.asarray(rng.uniform(3, 9, n), jnp.float32),
             jnp.asarray(rng.uniform(-6, 6, n), jnp.float32))
    dd = rng.normal(size=(3, n)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=0, keepdims=True)
    d = Vec3(jnp.asarray(dd[0]), jnp.asarray(-np.abs(dd[1])),
             jnp.asarray(dd[2]))

    hs = pst.closest_hit(accel, scene, o, d, 1e-4, np.float32(1e30))
    bs = pst.any_hit(accel, scene, o, d, 1e-4, np.float32(20.0))
    ts, bsn = np.asarray(hs.t), np.asarray(bs)

    on = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
    dn = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    t_ref = brute_closest(v0, e1, e2, on, dn)

    bad = np.abs(np.where(np.isinf(ts), 1e9, ts)
                 - np.where(np.isinf(t_ref), 1e9, t_ref)) > 1e-3
    any_bad = (bsn != (t_ref < 20.0)).sum()
    print(f"closest mismatches: {bad.sum()} / {n}")
    print(f"anyhit mismatches: {any_bad} / {n}")
    sys.exit(1 if (bad.sum() or any_bad) else 0)


if __name__ == "__main__":
    main()
