"""Component-cost isolation for the cluster tracer: times kernel variants
that stop after each pipeline stage (flags pass / +scan / +N forced opens).

Run ON THE TPU from the repo root: python tools/bench_trace_parts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.io.gltf import load_gltf
from spt_tpu.ops import pallas_trace as ptr
from spt_tpu.ops.vec3 import Vec3
from spt_tpu.scene.flatten import flatten_scene
from tools.bench_trace import make_rays

LANES = 128


def _kern(stage, forced_opens, n_clusters, k,
          ox, oy, oz, dx, dy, dz,
          cl_lo, cl_hi, tri_pack, cl_order,
          out_t, cl_flags, cl_list):
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    s, l = o.x.shape
    tmax = jnp.full((s, l), np.float32(1e30))
    oct_ = ((jnp.sum(d.x) < 0).astype(jnp.int32) * 4
            + (jnp.sum(d.y) < 0).astype(jnp.int32) * 2
            + (jnp.sum(d.z) < 0).astype(jnp.int32))
    ix = ptr._inv_dir(d.x)
    iy = ptr._inv_dir(d.y)
    iz = ptr._inv_dir(d.z)
    o3 = (o.x.reshape(1, s, l), o.y.reshape(1, s, l), o.z.reshape(1, s, l))
    d3 = (d.x.reshape(1, s, l), d.y.reshape(1, s, l), d.z.reshape(1, s, l))
    inv3 = (ix.reshape(1, s, l), iy.reshape(1, s, l), iz.reshape(1, s, l))
    best = jnp.full((s, l), np.float32(1e30))

    if stage == "base":
        out_t[:] = best + oct_.astype(jnp.float32)
        return
    ptr._box_flags(cl_lo, cl_hi, o3, inv3, np.float32(0.0),
                   tmax.reshape(1, s, l), cl_flags)
    if stage == "flags":
        out_t[:] = best + cl_flags[0, 0].astype(jnp.float32)
        return
    count = ptr._scan_open_list(n_clusters, oct_, cl_order, cl_flags, cl_list)
    if stage == "scan":
        out_t[:] = best + count.astype(jnp.float32)
        return

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, s, l), 0)

    def open_body(j, best):
        c = cl_list[j, 0] if stage != "openfix" else j % n_clusters
        blk = tri_pack[c]
        ok, t = ptr._tri_block_test(blk, k, o3, d3, np.float32(0.0),
                                    tmax.reshape(1, s, l))
        tb = jnp.where(ok, t, np.float32(1e30))
        tm = jnp.min(tb, axis=0)
        if stage in ("open", "openfix"):
            return jnp.minimum(best, tm)
        # full resolve
        win = tm < best
        eq = ok & (tb == tm.reshape(1, s, l))
        wi = jnp.max(jnp.where(eq, iota_k, -1), axis=0)
        uniq = eq & (iota_k == wi.reshape(1, s, l))
        picked = jnp.sum(jnp.where(uniq, ptr._unpack_col(blk, 9, k), 0.0),
                         axis=0)
        picked += jnp.sum(jnp.where(uniq, ptr._unpack_col(blk, 10, k), 0.0),
                          axis=0)
        picked += jnp.sum(jnp.where(uniq, ptr._unpack_col(blk, 11, k), 0.0),
                          axis=0)
        picked += jnp.sum(jnp.where(uniq, ptr._unpack_col(blk, 12, k), 0.0),
                          axis=0)
        return jnp.where(win, tm + 0.0 * picked, best)

    n_open = forced_opens if forced_opens else count
    best = jax.lax.fori_loop(0, n_open, open_body, best)
    out_t[:] = best


def run(stage, scene, o, d, forced_opens=0, iters=20, tile_rows=8):
    a = scene.accel
    n = o.x.shape[0]
    rows = n // LANES
    shape2 = (rows, LANES)

    def r2(x):
        return x.reshape(shape2)

    tables = [a.cluster_lo, a.cluster_hi, a.tri_pack, a.cl_order]
    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(x):
        return pl.BlockSpec(x.shape, (lambda nd: lambda i: (0,) * nd)(x.ndim),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kern, stage, forced_opens,
                             a.num_clusters, a.cluster_size)
    f = jax.jit(lambda *args: pl.pallas_call(
        kern,
        grid=(rows // tile_rows,),
        in_specs=[block] * 6 + [table_spec(x) for x in tables],
        out_specs=[block],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)],
        scratch_shapes=[pltpu.VMEM((a.num_clusters, 1), jnp.int32),
                        pltpu.SMEM((a.num_clusters, 1), jnp.int32)],
    )(*args))
    args = [r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z)] + tables
    r = f(*args)
    jax.block_until_ready(r)
    _ = float(np.asarray(r[0][:1]).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(np.asarray(r[0][:1]).sum())
    return (time.perf_counter() - t0) / iters


def main():
    n = 196608
    path = "/root/reference/assets/models/rattan_dining_chair/scene.gltf"
    desc = load_gltf(path)
    scene = flatten_scene(desc)
    a = scene.accel
    print(f"tris={scene.num_triangles} clusters={a.num_clusters} "
          f"K={a.cluster_size}")
    for kind in ("primary", "bounce"):
        o_np, d_np = make_rays(kind, n, desc, scene)
        o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
        res = {}
        for stage in ("base", "flags", "scan"):
            res[stage] = run(stage, scene, o, d) * 1e3
            res[stage + "T64"] = run(stage, scene, o, d, tile_rows=64) * 1e3
        print(kind, " ".join(f"{k}={v:.2f}ms" for k, v in res.items()))


if __name__ == "__main__":
    main()
