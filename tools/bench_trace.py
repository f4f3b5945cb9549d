"""Microbenchmark for the Pallas cluster tracer (ops/pallas_trace.py).

Times closest_hit / any_hit on the glTF chair for three ray populations:
- primary: coherent camera rays (what tile culling is built for)
- bounce: cosine-scattered rays from first-hit points (the hard case)
- random: fully incoherent rays inside the scene AABB (worst case)

Run ON THE TPU from the repo root:  python tools/bench_trace.py [--n 196608]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spt_tpu.camera import Camera
from spt_tpu.io.gltf import bounding_box, load_gltf
from spt_tpu.ops import pallas_trace
from spt_tpu.ops.vec3 import Vec3
from spt_tpu.scene.flatten import flatten_scene


def make_rays(kind: str, n: int, desc, scene):
    lo, hi = bounding_box(desc)
    center = (lo + hi) / 2
    extent = float(np.linalg.norm(hi - lo))
    rng = np.random.default_rng(0)
    if kind == "primary":
        w = 512
        h = n // w
        cam = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
                     target=center, fov_degrees=60.0, aspect_ratio=w / h)
        ys, xs = np.divmod(np.arange(n), w)
        u = (xs + 0.5) / w
        v = (ys + 0.5) / h
        o_np = np.broadcast_to(cam.position, (n, 3)).astype(np.float32)
        dirs = (cam.forward[None, :]
                + cam.right[None, :] * ((2 * u - 1) * cam.half_width)[:, None]
                - cam.up[None, :] * ((2 * v - 1) * cam.half_height)[:, None])
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        return o_np, dirs.astype(np.float32)
    if kind == "bounce":
        # first trace primaries, then cosine-scatter from hit points
        o_np, d_np = make_rays("primary", n, desc, scene)
        o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
        hit = pallas_trace.closest_hit(scene.accel, scene, o, d)
        t = np.asarray(hit.t)
        nrm = np.stack([np.asarray(hit.normal.x), np.asarray(hit.normal.y),
                        np.asarray(hit.normal.z)], 1)
        hitm = np.isfinite(t)
        t = np.where(hitm, t, 1.0)
        p = o_np + t[:, None] * d_np
        nl = np.linalg.norm(nrm, axis=1, keepdims=True)
        nrm = np.where(nl > 0, nrm / np.maximum(nl, 1e-12), np.array([0, 1, 0.]))
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        v = np.where((v * nrm).sum(1, keepdims=True) < 0, -v, v)
        o2 = p + nrm * 1e-3
        return o2.astype(np.float32), v.astype(np.float32)
    # random
    o_np = (rng.uniform(size=(n, 3)) * (hi - lo) + lo).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    return o_np, d_np


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0][:1]).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0][:1]).sum())
    return (time.perf_counter() - t0) / iters


def main():
    n = 196608
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    k = 64
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    path = "/root/reference/assets/models/rattan_dining_chair/scene.gltf"
    desc = load_gltf(path)
    scene = flatten_scene(desc, cluster_size=k)
    a = scene.accel
    print(f"tris={scene.num_triangles} clusters={a.num_clusters} "
          f"K={a.cluster_size} rays={n}")

    closest = jax.jit(lambda o, d: pallas_trace.closest_hit(a, scene, o, d))
    anyh = jax.jit(lambda o, d: pallas_trace.any_hit(a, scene, o, d, tmax=1e30))

    for kind in ("primary", "bounce", "bounce-sorted", "random",
                 "random-sorted"):
        base = kind.replace("-sorted", "")
        o_np, d_np = make_rays(base, n, desc, scene)
        if kind.endswith("-sorted"):
            # stable octant sort (what a device-side counting sort would do)
            oct_ = ((d_np[:, 0] < 0) * 4 + (d_np[:, 1] < 0) * 2
                    + (d_np[:, 2] < 0)).astype(np.int32)
            perm = np.argsort(oct_, kind="stable")
            o_np, d_np = o_np[perm], d_np[perm]
        o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
        dt_c = timeit(closest, o, d)
        dt_a = timeit(anyh, o, d)
        print(f"{kind:8s} closest {dt_c*1e3:7.2f} ms ({n/dt_c/1e6:7.1f} Mrays/s)"
              f"   any {dt_a*1e3:7.2f} ms ({n/dt_a/1e6:7.1f} Mrays/s)")


if __name__ == "__main__":
    main()
