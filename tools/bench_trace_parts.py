"""Component-cost isolation for the cluster tracer: times kernel variants
that stop after each pipeline stage (flags pass / +scan / +opens / +resolve
/ the real closest/any-hit tile functions).

Per-dispatch overhead through the axon relay is ~3 ms — bigger than most of
these kernels — so each timing jits ONE program that chains R invocations
back-to-back (the output feeds the next call's tmax so nothing hoists) and
reports (t(R=9) - t(R=1)) / 8 per invocation, dispatch excluded.

Run ON THE TPU from the repo root: python -m tools.bench_trace_parts
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

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

from spt_tpu.io.gltf import load_gltf
from spt_tpu.ops import pallas_trace as ptr
from spt_tpu.ops.vec3 import Vec3
from spt_tpu.scene.flatten import flatten_scene
from tools.bench_trace import make_rays

LANES = 128


def _kern(stage, n_clusters, k, n_sph,
          ox, oy, oz, dx, dy, dz, tmaxr,
          cl_lo, cl_hi, tri_pack, cl_okey, sph_c, sph_r, sph_m,
          out_t):
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    s, l = o.x.shape
    tmax = tmaxr[:]
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
    if stage == "closest":
        res = ptr.closest_hit_tile(
            (cl_lo, cl_hi, tri_pack, cl_okey),
            n_clusters, k, n_sph, np.float32(0.0), sph_c, sph_r, sph_m,
            o, d, tmax)
        out_t[:] = res[0]
        return
    if stage == "anyhit":
        blocked = ptr.any_hit_tile(
            (cl_lo, cl_hi, tri_pack, cl_okey),
            n_clusters, k, n_sph, np.float32(0.0), sph_c, sph_r, sph_m,
            o, d, tmax)
        out_t[:] = blocked.astype(jnp.float32)
        return
    flags = ptr._box_flags(cl_lo, cl_hi, o3, inv3, np.float32(0.0),
                           tmax.reshape(1, s, l))
    if stage == "flags":
        out_t[:] = best + flags.astype(jnp.float32)[0, 0]
        return
    count, key0 = ptr._visit_keys(flags, cl_okey, oct_)
    if stage == "scan":
        out_t[:] = best + count.astype(jnp.float32)
        return

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, s, l), 0)

    def open_body(j, carry):
        key, best = carry
        m = jnp.min(key)
        c = m & ptr._OKEY_ID_MASK
        key = jnp.where(key == m, ptr._OKEY_MISS, key)
        blk = tri_pack[c]
        ok, t, _u, _v = ptr._tri_block_test(blk, k, o3, d3, np.float32(0.0),
                                            tmax.reshape(1, s, l))
        tb = jnp.where(ok, t, np.float32(1e30))
        tm = jnp.min(tb, axis=0)
        if stage == "open":
            return key, jnp.minimum(best, tm)
        # full resolve (same shape as closest_hit_tile's resolve)
        win = tm < best
        eq = ok & (tb == tm.reshape(1, s, l))
        wi = jnp.max(jnp.where(eq, iota_k, -1), axis=0)
        uniq = eq & (iota_k == wi.reshape(1, s, l))
        picked = jnp.sum(jnp.where(uniq, ptr._unpack_col(blk, 9, k), 0.0),
                         axis=0)
        for col in (10, 11, 12):
            picked += jnp.sum(
                jnp.where(uniq, ptr._unpack_col(blk, col, k), 0.0), axis=0)
        return key, jnp.where(win, tm + 0.0 * picked, best)

    _, best = jax.lax.fori_loop(0, count, open_body, (key0, best))
    out_t[:] = best


def build_fn(stage, scene, repeats, tile_rows=8, n=196608):
    a = scene.accel
    rows = n // LANES
    shape2 = (rows, LANES)
    tables = [a.cluster_lo, a.cluster_hi, a.tri_pack, a.cl_okey,
              scene.sph_center, scene.sph_radius.reshape(-1, 1),
              scene.sph_mat.reshape(-1, 1)]
    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(x):
        return pl.BlockSpec(x.shape, (lambda nd: lambda i: (0,) * nd)(x.ndim),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kern, stage, a.num_clusters, a.cluster_size,
                             scene.num_spheres)
    call = lambda *args: pl.pallas_call(
        kern,
        grid=(rows // tile_rows,),
        in_specs=[block] * 7 + [table_spec(x) for x in tables],
        out_specs=[block],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)],
    )(*args)[0]

    def chained(ox, oy, oz, dx, dy, dz, tmax0):
        def body(_, t):
            # tmax rides the carry so successive calls cannot be hoisted;
            # min(1e30) keeps the value semantically identical each round.
            return call(ox, oy, oz, dx, dy, dz,
                        jnp.minimum(t, np.float32(1e30)), *tables)

        return jax.lax.fori_loop(0, repeats, body, tmax0)

    return jax.jit(chained), shape2


def time_stage(stage, scene, o, d, tile_rows=8, trials=3):
    n = o.x.shape[0]

    def r2(x):
        return x.reshape(n // LANES, LANES)

    args = [r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z)]
    tmax0 = jnp.full((n // LANES, LANES), np.float32(1e30))
    results = {}
    for repeats in (1, 9):
        f, _ = build_fn(stage, scene, repeats, tile_rows)
        r = f(*args, tmax0)
        jax.block_until_ready(r)
        _ = float(np.asarray(r[:1, :1]).sum())
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(5):
                r = f(*args, tmax0)
            _ = float(np.asarray(r[:1, :1]).sum())
            ts.append((time.perf_counter() - t0) / 5)
        results[repeats] = float(np.median(ts))
    return (results[9] - results[1]) / 8 * 1e3


def main():
    n = 196608
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    stages = (["base", "flags", "scan", "open", "full", "closest", "anyhit"]
              if which == "all" else which.split(","))
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
        for stage in stages:
            res[stage] = time_stage(stage, scene, o, d)
            print(kind, f"{stage}={res[stage]:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
