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

    if stage == "openread":
        # extraction + dynamic block read only: no triangle math
        def read_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            return key, best + blk[0, 0]

        _, best = jax.lax.fori_loop(0, count, read_body, (key0, best))
        out_t[:] = best
        return

    if stage == "opens":
        # sub-blocked M-T (the production tri_block_min path)
        def opens_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            tm, _wi = ptr.tri_block_min(blk, k, s, l, o3, d3,
                                        np.float32(0.0),
                                        tmax.reshape(1, s, l), False)
            return key, jnp.minimum(best, tm)

        _, best = jax.lax.fori_loop(0, count, opens_body, (key0, best))
        out_t[:] = best
        return

    if stage == "openst":
        # tm-only sub-blocked M-T: no winner-index/uv bookkeeping per open
        # (sizes moving ALL winner resolution behind the resolve cond)
        kb = ptr._sub_k(k)

        o2f, d2f = ptr._flat2(o3), ptr._flat2(d3)
        (tmax2f,) = ptr._flat2((tmax.reshape(1, s, l),))

        def openst_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            tm = jnp.full((1, s * l), np.float32(1e30))
            for k0 in range(0, k, kb):
                ok, t, _u, _v = ptr._tri_sub_test(
                    blk, k0, kb, o2f, d2f, np.float32(0.0), tmax2f)
                tm = jnp.minimum(tm, jnp.min(
                    jnp.where(ok, t, np.float32(1e30)), axis=0,
                    keepdims=True))
            return key, jnp.minimum(best, tm.reshape(s, l))

        _, best = jax.lax.fori_loop(0, count, openst_body, (key0, best))
        out_t[:] = best
        return

    if stage == "opens2d":
        # sub-blocked M-T with (KB, S*L) 2-D shapes instead of (KB, 8, 128)
        # 3-D — does Mosaic lower the flat layout's broadcasts better?
        kb = ptr._sub_k(k)
        sl = s * l
        o2 = tuple(v.reshape(1, sl) for v in o3)
        d2 = tuple(v.reshape(1, sl) for v in d3)
        tmax2 = tmax.reshape(1, sl)

        def u2(blk, i, k0):
            return blk[k0:k0 + kb, i:i + 1]

        def opens2d_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            tm = jnp.full((1, sl), np.float32(1e30))
            for k0 in range(0, k, kb):
                v0x, v0y, v0z = (u2(blk, i, k0) for i in (0, 1, 2))
                e1x, e1y, e1z = (u2(blk, i, k0) for i in (3, 4, 5))
                e2x, e2y, e2z = (u2(blk, i, k0) for i in (6, 7, 8))
                ox, oy, oz = o2
                dx, dy, dz = d2
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / jnp.where(jnp.abs(a) > 1e-12, a, 1.0)
                sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t > np.float32(0.0)) & (t < tmax2))
                tm = jnp.minimum(tm, jnp.min(
                    jnp.where(ok, t, np.float32(1e30)), axis=0,
                    keepdims=True))
            return key, jnp.minimum(best, tm.reshape(s, l))

        _, best = jax.lax.fori_loop(0, count, opens2d_body, (key0, best))
        out_t[:] = best
        return

    if stage == "openps":
        # sub-blocked plane-based stand-in (FAKED columns, right cost):
        # retry of the plane-vs-M-T A/B now that sub-blocking removed the
        # VMEM spills the first A/B was bound by.
        kb = ptr._sub_k(k)
        op, dp = ptr._flat2(o3), ptr._flat2(d3)
        (tmaxp,) = ptr._flat2((tmax.reshape(1, s, l),))

        def openps_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            u = ptr._unpack_sub
            tm = jnp.full((1, s * l), np.float32(1e30))
            for k0 in range(0, k, kb):
                nx, ny, nz = (u(blk, i, k0, kb) for i in (9, 10, 11))
                d0 = u(blk, 0, k0, kb)
                gux, guy, guz = (u(blk, i, k0, kb) for i in (3, 4, 5))
                cu = u(blk, 1, k0, kb)
                gvx, gvy, gvz = (u(blk, i, k0, kb) for i in (6, 7, 8))
                cv = u(blk, 2, k0, kb)
                den = nx * dp[0] + ny * dp[1] + nz * dp[2]
                num = d0 - (nx * op[0] + ny * op[1] + nz * op[2])
                t = num / jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
                px = op[0] + t * dp[0]
                py = op[1] + t * dp[1]
                pz = op[2] + t * dp[2]
                bu = gux * px + guy * py + guz * pz + cu
                bv = gvx * px + gvy * py + gvz * pz + cv
                ok = ((jnp.abs(den) > 1e-12) & (bu >= 0.0) & (bv >= 0.0)
                      & (bu + bv <= 1.0) & (t > 0.0) & (t < tmaxp))
                tb = jnp.where(ok, t, np.float32(1e30))
                tm = jnp.minimum(tm, jnp.min(tb, axis=0, keepdims=True))
            return key, jnp.minimum(best, tm.reshape(s, l))

        _, best = jax.lax.fori_loop(0, count, openps_body, (key0, best))
        out_t[:] = best
        return

    if stage in ("openmx", "openmxs"):
        # plane-based test with the six (tri x ray) dot products as TWO
        # dot_generals on the MXU: rows [n | gu | gv] (3K, 3) against the
        # ray direction and origin planes (3, S*L).  FAKED coefficient
        # columns (right cost, wrong results) — sizing the MXU offload
        # before changing the builder layout.  openmxs sub-blocks at KB=16.
        kb = k if stage == "openmx" else 16
        sl = s * l
        d_mat = jnp.concatenate(
            [v.reshape(1, sl) for v in d3], axis=0)          # (3, SL)
        o_mat = jnp.concatenate(
            [v.reshape(1, sl) for v in o3], axis=0)          # (3, SL)

        import os
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[
                    os.environ.get("SPT_MX_PREC", "highest")]

        def dot(g, m_):
            return jax.lax.dot_general(
                g, m_, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32)          # (KB, SL)

        def openmx_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            tm2 = jnp.full((sl,), np.float32(1e30))
            for k0 in range(0, k, kb):
                # fake coefficient rows from existing contiguous columns
                gn = blk[k0:k0 + kb, 0:3]
                gu = blk[k0:k0 + kb, 3:6]
                gv = blk[k0:k0 + kb, 6:9]
                den = dot(gn, d_mat)
                gud, gvd = dot(gu, d_mat), dot(gv, d_mat)
                nod = dot(gn, o_mat)
                guo, gvo = dot(gu, o_mat), dot(gv, o_mat)
                d0 = blk[k0:k0 + kb, 0:1]
                cu = blk[k0:k0 + kb, 1:2]
                cv = blk[k0:k0 + kb, 2:3]
                t = (d0 - nod) / jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
                bu = guo + cu + t * gud
                bv = gvo + cv + t * gvd
                ok = ((jnp.abs(den) > 1e-12) & (bu >= 0.0) & (bv >= 0.0)
                      & (bu + bv <= 1.0) & (t > 0.0)
                      & (t < tmax.reshape(1, sl)))
                tb = jnp.where(ok, t, np.float32(1e30))
                tm2 = jnp.minimum(tm2, jnp.min(tb, axis=0))
            return key, jnp.minimum(best, tm2.reshape(s, l))

        _, best = jax.lax.fori_loop(0, count, openmx_body, (key0, best))
        out_t[:] = best
        return

    if stage == "openx2":
        # two min-extractions + two block tests per iteration
        def x2_body(j, carry):
            key, best = carry
            for _ in range(2):
                m = jnp.min(key)
                c = jnp.minimum(m & ptr._OKEY_ID_MASK, n_clusters - 1)
                key = jnp.where(key == m, ptr._OKEY_MISS, key)
                blk = tri_pack[c]
                ok, t, _u, _v = ptr._tri_block_test(
                    blk, k, o3, d3, np.float32(0.0), tmax.reshape(1, s, l))
                tb = jnp.where(ok & (m != ptr._OKEY_MISS), t,
                               np.float32(1e30))
                best = jnp.minimum(best, jnp.min(tb, axis=0))
            return key, best

        _, best = jax.lax.fori_loop(0, (count + 1) // 2, x2_body,
                                    (key0, best))
        out_t[:] = best
        return

    if stage == "openp":
        # plane-based M-T stand-in: same op structure as a precomputed
        # (n, d0, gu, cu, gv, cv) test — gradient columns are FAKED from the
        # existing pack (wrong results, right cost) to size the win before
        # changing the builder layout.
        def openp_body(j, carry):
            key, best = carry
            m = jnp.min(key)
            c = m & ptr._OKEY_ID_MASK
            key = jnp.where(key == m, ptr._OKEY_MISS, key)
            blk = tri_pack[c]
            u = ptr._unpack_col
            nx, ny, nz = u(blk, 9, k), u(blk, 10, k), u(blk, 11, k)
            d0 = u(blk, 0, k)
            gux, guy, guz = u(blk, 3, k), u(blk, 4, k), u(blk, 5, k)
            cu = u(blk, 1, k)
            gvx, gvy, gvz = u(blk, 6, k), u(blk, 7, k), u(blk, 8, k)
            cv = u(blk, 2, k)
            den = nx * d3[0] + ny * d3[1] + nz * d3[2]
            num = d0 - (nx * o3[0] + ny * o3[1] + nz * o3[2])
            t = num / jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
            px = o3[0] + t * d3[0]
            py = o3[1] + t * d3[1]
            pz = o3[2] + t * d3[2]
            bu = gux * px + guy * py + guz * pz + cu
            bv = gvx * px + gvy * py + gvz * pz + cv
            ok = ((jnp.abs(den) > 1e-12) & (bu >= 0.0) & (bv >= 0.0)
                  & (bu + bv <= 1.0) & (t > 0.0)
                  & (t < tmax.reshape(1, s, l)))
            tb = jnp.where(ok, t, np.float32(1e30))
            return key, jnp.minimum(best, jnp.min(tb, axis=0))

        _, best = jax.lax.fori_loop(0, count, openp_body,
                                    (key0, best))
        out_t[:] = best
        return

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
            # the output feeds the next tmax so successive calls cannot be
            # hoisted, but the VALUE is tmax0 every round (+ 0*out, which
            # XLA cannot fold away for floats), so each round does
            # identical work and per-lane deadness (tmax0 = 0) persists.
            out = call(ox, oy, oz, dx, dy, dz, t, *tables)
            return tmax0 + 0.0 * out

        return jax.lax.fori_loop(0, repeats, body, tmax0)

    return jax.jit(chained), shape2


def time_stage(stage, scene, o, d, tile_rows=8, trials=3, tmax_np=None):
    n = o.x.shape[0]

    def r2(x):
        return x.reshape(n // LANES, LANES)

    args = [r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z)]
    if tmax_np is None:
        tmax0 = jnp.full((n // LANES, LANES), np.float32(1e30))
    else:
        tmax0 = r2(jnp.asarray(tmax_np, jnp.float32))
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
    for kind in ("primary", "bounce", "sortedb1"):
        if kind == "sortedb1":
            o_np, d_np, tmax_np = make_sorted_b1(n, desc, scene)
            live = int((tmax_np > 0).sum())
            live_tiles = int((tmax_np.reshape(-1, 8 * LANES) > 0)
                             .any(1).sum())
            print(f"sortedb1 live={live} live_tiles={live_tiles}/"
                  f"{n // (8 * LANES)}", flush=True)
        else:
            o_np, d_np = make_rays(kind, n, desc, scene)
            tmax_np = None
        o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
        if tmax_np is None:
            print(kind, f"total_opens={count_opens(scene, o_np, d_np):d}",
                  flush=True)
        res = {}
        for stage in stages:
            res[stage] = time_stage(stage, scene, o, d, tmax_np=tmax_np)
            print(kind, f"{stage}={res[stage]:.3f}ms", flush=True)


def make_sorted_b1(n, desc, scene, chunk=8192):
    """Realistic sorted bounce-1 rays: cosine-scatter from primary hits,
    dead (miss) lanes tmax = 0, lanes sorted by the production sort key
    within `chunk`-lane chunks (numpy argsort stands in for the bitonic)."""
    from spt_tpu.ops import ray_sort

    o_np, d_np = make_rays("bounce", n, desc, scene)
    op, dp = make_rays("primary", n, desc, scene)
    o = Vec3(*(jnp.asarray(op[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dp[:, i]) for i in range(3)))
    hit = ptr.closest_hit(scene.accel, scene, o, d)
    alive = np.isfinite(np.asarray(hit.t))
    a = scene.accel
    lo = np.asarray(a.cluster_lo).min(0)
    hi = np.asarray(a.cluster_hi).max(0)
    inv = 1.0 / np.maximum(hi - lo, 1e-9)
    key = np.asarray(ray_sort.sort_key(
        Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3))),
        jnp.asarray(alive), jnp.asarray(lo.astype(np.float32)),
        jnp.asarray(inv.astype(np.float32))))
    order = np.argsort(key.reshape(-1, chunk), axis=1, kind="stable")
    order = (order + np.arange(0, n, chunk)[:, None]).reshape(-1)
    tmax = np.where(alive, np.float32(1e30), np.float32(0.0))
    return o_np[order], d_np[order], tmax[order]


def count_opens(scene, o_np, d_np, tile=8 * LANES):
    """Exact number of cluster opens the kernel will run: per 8x128 subtile,
    count clusters whose AABB any lane's slab test passes (numpy replica of
    _box_flags with tmax=inf)."""
    a = scene.accel
    lo = np.asarray(a.cluster_lo)         # (C, 3)
    hi = np.asarray(a.cluster_hi)
    inv = np.where(np.abs(d_np) > 1e-20, 1.0 / d_np,
                   np.where(d_np >= 0, 1e30, -1e30))
    total = 0
    for i in range(0, o_np.shape[0], tile):
        o = o_np[i:i + tile]
        iv = inv[i:i + tile]
        t0 = (lo[:, None] - o[None]) * iv[None]       # (C, T, 3)
        t1 = (hi[:, None] - o[None]) * iv[None]
        tnear = np.minimum(t0, t1).max(-1)
        tfar = np.maximum(t0, t1).min(-1)
        total += int((np.maximum(tnear, 0.0) <= tfar).any(-1).sum())
    return total


if __name__ == "__main__":
    main()
