"""Pallas stream-traversal kernels: cluster-culled mesh tracing.

The traversal design for TPU (see ops/bvh.py): every lane slab-tests every
cluster AABB, but a whole ray tile skips a cluster's triangle loop when no
lane in the tile can hit it — `@pl.when` on a scalar any-reduction, the kind
of branch a vector machine can actually take.  Triangles stream from VMEM
with scalar dynamic reads inside a rolled `fori_loop`, so program size is
O(1) in scene size and Mosaic compiles fast regardless of triangle count.

Analytic spheres (always few: the reference's user geometry,
EmbreeBackend.cpp:139-178) are an unrolled scalar loop in the same kernel.

Kernels:
- closest_hit: full Hit record (t, geometric normal, material, kind).
- any_hit: boolean occlusion with per-lane tmax (shadow rays, Light.cpp:16-40)
  and whole-kernel early exit once every lane in the tile is blocked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.ops.vec3 import Vec3
from spt_tpu.ops import intersect as isect

LANES = 128
TILE_ROWS = 32

_BIG = np.float32(1e30)
_MT_EPS = 1e-9


def _inv_dir(dx):
    """Safe reciprocal: zero components -> huge (slab test still correct
    because (lo - o) * inf keeps its sign)."""
    return jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, jnp.where(dx >= 0, _BIG, -_BIG))


def _slab(lo0, lo1, lo2, hi0, hi1, hi2, o, ix, iy, iz, tmin, tmax):
    t0x = (lo0 - o.x) * ix
    t1x = (hi0 - o.x) * ix
    t0y = (lo1 - o.y) * iy
    t1y = (hi1 - o.y) * iy
    t0z = (lo2 - o.z) * iz
    t1z = (hi2 - o.z) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), tmax),
    )
    return tnear <= tfar


def _tri_test(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, o, d, tmin, tmax, best):
    hx = d.y * e2z - d.z * e2y
    hy = d.z * e2x - d.x * e2z
    hz = d.x * e2y - d.y * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    inv = 1.0 / jnp.where(jnp.abs(a) > _MT_EPS, a, 1.0)
    sx, sy, sz = o.x - v0x, o.y - v0y, o.z - v0z
    u = inv * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = inv * (d.x * qx + d.y * qy + d.z * qz)
    t = inv * (e2x * qx + e2y * qy + e2z * qz)
    ok = (
        (jnp.abs(a) > _MT_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax) & (t < best)
    )
    return ok, t


def _closest_kernel(n_clusters, k, n_sph, tmin,
                    ox, oy, oz, dx, dy, dz, tmaxr,
                    sup_lo, sup_hi, cl_lo, cl_hi, tv0, te1, te2, tmat,
                    sph_c, sph_r, sph_m,
                    out_t, out_nx, out_ny, out_nz, out_mat, out_kind,
                    best_t, best_mat, best_kind, ax, ay, az, rinv):
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    tmax = tmaxr[:]
    ix, iy, iz = _inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z)

    best_t[:] = jnp.full(o.x.shape, _BIG)
    best_mat[:] = jnp.zeros(o.x.shape, jnp.int32)
    best_kind[:] = jnp.zeros(o.x.shape, jnp.int32)
    ax[:] = jnp.zeros(o.x.shape, jnp.float32)
    ay[:] = jnp.zeros(o.x.shape, jnp.float32)
    az[:] = jnp.zeros(o.x.shape, jnp.float32)
    rinv[:] = jnp.zeros(o.x.shape, jnp.float32)

    n_supers = sup_lo.shape[0]
    super_factor = n_clusters // n_supers

    def super_body(sc, _):
        sup_hit = _slab(
            sup_lo[sc, 0], sup_lo[sc, 1], sup_lo[sc, 2],
            sup_hi[sc, 0], sup_hi[sc, 1], sup_hi[sc, 2],
            o, ix, iy, iz, tmin, jnp.minimum(tmax, best_t[:]),
        )

        @pl.when(jnp.any(sup_hit))
        def _():
            def cluster_body(ci, _):
                c = sc * super_factor + ci
                box_hit = _slab(
                    cl_lo[c, 0], cl_lo[c, 1], cl_lo[c, 2],
                    cl_hi[c, 0], cl_hi[c, 1], cl_hi[c, 2],
                    o, ix, iy, iz, tmin, jnp.minimum(tmax, best_t[:]),
                )

                @pl.when(jnp.any(box_hit))
                def _():
                    def tri_body(j, _):
                        idx = c * k + j
                        v0x, v0y, v0z = tv0[idx, 0], tv0[idx, 1], tv0[idx, 2]
                        e1x, e1y, e1z = te1[idx, 0], te1[idx, 1], te1[idx, 2]
                        e2x, e2y, e2z = te2[idx, 0], te2[idx, 1], te2[idx, 2]
                        ok, t = _tri_test(v0x, v0y, v0z, e1x, e1y, e1z,
                                          e2x, e2y, e2z, o, d, tmin, tmax,
                                          best_t[:])
                        best_t[:] = jnp.where(ok, t, best_t[:])
                        best_mat[:] = jnp.where(ok, tmat[idx, 0], best_mat[:])
                        best_kind[:] = jnp.where(ok, isect.KIND_TRIANGLE,
                                                 best_kind[:])
                        nx = e1y * e2z - e1z * e2y
                        ny = e1z * e2x - e1x * e2z
                        nz = e1x * e2y - e1y * e2x
                        ax[:] = jnp.where(ok, nx, ax[:])
                        ay[:] = jnp.where(ok, ny, ay[:])
                        az[:] = jnp.where(ok, nz, az[:])
                        return 0

                    jax.lax.fori_loop(0, k, tri_body, 0)

                return 0

            jax.lax.fori_loop(0, super_factor, cluster_body, 0)

        return 0

    jax.lax.fori_loop(0, n_supers, super_body, 0)

    for i in range(n_sph):
        cx, cy, cz = sph_c[i, 0], sph_c[i, 1], sph_c[i, 2]
        r = sph_r[i, 0]
        ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
        b = ocx * d.x + ocy * d.y + ocz * d.z
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where((t0 > tmin) & (t0 < tmax), t0, t1)
        ok = (disc > 0.0) & (r > 0.0) & (t > tmin) & (t < tmax) & (t < best_t[:])
        best_t[:] = jnp.where(ok, t, best_t[:])
        best_mat[:] = jnp.where(ok, sph_m[i, 0], best_mat[:])
        best_kind[:] = jnp.where(ok, isect.KIND_SPHERE, best_kind[:])
        ax[:] = jnp.where(ok, cx, ax[:])
        ay[:] = jnp.where(ok, cy, ay[:])
        az[:] = jnp.where(ok, cz, az[:])
        rinv[:] = jnp.where(ok, 1.0 / jnp.maximum(r, 1e-12), rinv[:])

    bt = best_t[:]
    kind = best_kind[:]
    hitm = kind != isect.KIND_MISS
    t_safe = jnp.where(hitm, bt, 0.0)
    is_sph = kind == isect.KIND_SPHERE
    px = o.x + t_safe * d.x
    py = o.y + t_safe * d.y
    pz = o.z + t_safe * d.z
    out_t[:] = jnp.where(hitm, bt, _BIG * 1e7)  # becomes inf downstream
    out_nx[:] = jnp.where(is_sph, (px - ax[:]) * rinv[:], ax[:])
    out_ny[:] = jnp.where(is_sph, (py - ay[:]) * rinv[:], ay[:])
    out_nz[:] = jnp.where(is_sph, (pz - az[:]) * rinv[:], az[:])
    out_mat[:] = best_mat[:]
    out_kind[:] = kind


def _any_kernel(n_clusters, k, n_sph, tmin,
                ox, oy, oz, dx, dy, dz, tmaxr,
                sup_lo, sup_hi, cl_lo, cl_hi, tv0, te1, te2, tmat,
                sph_c, sph_r, sph_m,
                out_blocked):
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    tmax = tmaxr[:]
    ix, iy, iz = _inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z)

    # int32 mask carry: Mosaic cannot legalize bool (i1) loop carries.
    blocked0 = jnp.zeros(o.x.shape, jnp.int32)
    far = jnp.full(o.x.shape, _BIG)

    for i in range(n_sph):
        cx, cy, cz = sph_c[i, 0], sph_c[i, 1], sph_c[i, 2]
        r = sph_r[i, 0]
        ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
        b = ocx * d.x + ocy * d.y + ocz * d.z
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where((t0 > tmin) & (t0 < tmax), t0, t1)
        hit = (disc > 0.0) & (r > 0.0) & (t > tmin) & (t < tmax)
        blocked0 = blocked0 | hit.astype(jnp.int32)

    def cond(carry):
        sc, blocked = carry
        return (sc < sup_lo.shape[0]) & ~jnp.all(blocked != 0)

    n_supers = sup_lo.shape[0]
    super_factor = n_clusters // n_supers

    def body(carry):
        sc, blocked = carry
        sup_hit = _slab(
            sup_lo[sc, 0], sup_lo[sc, 1], sup_lo[sc, 2],
            sup_hi[sc, 0], sup_hi[sc, 1], sup_hi[sc, 2],
            o, ix, iy, iz, tmin, tmax,
        ) & (blocked == 0)

        def run_clusters(blocked):
            def cluster_body(ci, blocked):
                c = sc * super_factor + ci
                return _any_cluster(c, blocked)
            return jax.lax.fori_loop(0, super_factor, cluster_body, blocked)

        blocked = jax.lax.cond(jnp.any(sup_hit), run_clusters,
                               lambda b: b, blocked)
        return sc + 1, blocked

    def _any_cluster(c, blocked):
        box_hit = _slab(
            cl_lo[c, 0], cl_lo[c, 1], cl_lo[c, 2],
            cl_hi[c, 0], cl_hi[c, 1], cl_hi[c, 2],
            o, ix, iy, iz, tmin, tmax,
        ) & (blocked == 0)

        def run_tris(blocked):
            def tri_body(j, blocked):
                idx = c * k + j
                ok, _ = _tri_test(
                    tv0[idx, 0], tv0[idx, 1], tv0[idx, 2],
                    te1[idx, 0], te1[idx, 1], te1[idx, 2],
                    te2[idx, 0], te2[idx, 1], te2[idx, 2],
                    o, d, tmin, tmax, far,
                )
                return blocked | ok.astype(jnp.int32)

            return jax.lax.fori_loop(0, k, tri_body, blocked)

        return jax.lax.cond(jnp.any(box_hit), run_tris, lambda b: b, blocked)

    _, blocked = jax.lax.while_loop(cond, body, (jnp.int32(0), blocked0))
    out_blocked[:] = blocked


def _common_call(kernel, accel, scene, o: Vec3, d: Vec3, tmin, tmax,
                 out_shapes, out_specs_count, scratch=()):
    n = o.x.shape[0]
    rows = n // LANES
    shape2 = (rows, LANES)
    tile_rows = _divisor(rows)

    def r2(a):
        return a.reshape(shape2)

    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    state = [r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z), r2(tmax_arr)]
    tables = [accel.super_lo, accel.super_hi,
              accel.cluster_lo, accel.cluster_hi, accel.tri_v0, accel.tri_e1,
              accel.tri_e2, accel.tri_mat.reshape(-1, 1),
              scene.sph_center, scene.sph_radius.reshape(-1, 1),
              scene.sph_mat.reshape(-1, 1)]

    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(a):
        shp = a.shape
        return pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                            memory_space=pltpu.VMEM)

    k = accel.cluster_size
    kern = functools.partial(
        kernel, accel.num_clusters, k, scene.num_spheres, np.float32(tmin)
    )
    outs = pl.pallas_call(
        kern,
        grid=(rows // tile_rows,),
        in_specs=[block] * 7 + [table_spec(a) for a in tables],
        out_specs=[block] * out_specs_count,
        out_shape=[jax.ShapeDtypeStruct(shape2, dt) for dt in out_shapes],
        scratch_shapes=[pltpu.VMEM((tile_rows, LANES), dt) for dt in scratch],
    )(*state, *tables)
    return outs, n


def _divisor(rows: int) -> int:
    """Multiple-of-8 divisor (Mosaic sublane constraint), else whole array."""
    for cand in range(min(TILE_ROWS, rows) // 8 * 8, 0, -8):
        if rows % cand == 0:
            return cand
    return rows


def closest_hit(accel, scene, o: Vec3, d: Vec3, tmin=0.0, tmax=np.float32(np.inf)):
    """Pallas cluster-culled closest hit -> isect.HitV."""
    tmax = np.float32(min(float(tmax), 1e30)) if isinstance(tmax, (int, float)) else tmax
    outs, n = _common_call(
        _closest_kernel, accel, scene, o, d, tmin, tmax,
        out_shapes=[jnp.float32, jnp.float32, jnp.float32, jnp.float32,
                    jnp.int32, jnp.int32],
        out_specs_count=6,
        scratch=[jnp.float32, jnp.int32, jnp.int32,
                 jnp.float32, jnp.float32, jnp.float32, jnp.float32],
    )
    t, nx, ny, nz, mat, kind = (x.reshape(n) for x in outs)
    t = jnp.where(kind != isect.KIND_MISS, t, jnp.float32(jnp.inf))
    return isect.HitV(t=t, normal=Vec3(nx, ny, nz), mat_id=mat, kind=kind)


def any_hit(accel, scene, o: Vec3, d: Vec3, tmin=0.0, tmax=np.float32(np.inf)):
    """Pallas cluster-culled occlusion -> (N,) bool."""
    tmax = np.float32(min(float(tmax), 1e30)) if isinstance(tmax, (int, float)) else tmax
    outs, n = _common_call(
        _any_kernel, accel, scene, o, d, tmin, tmax,
        out_shapes=[jnp.int32],
        out_specs_count=1,
    )
    return outs[0].reshape(n) != 0
