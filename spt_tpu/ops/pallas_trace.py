"""Pallas stream-traversal kernels: cluster-culled mesh tracing.

The traversal design for TPU (see ops/bvh.py for the build): each grid step
owns one (SUBTILE_ROWS, 128) block of rays and

1. slab-tests EVERY cluster AABB against the whole subtile in one broadcast
   (C, S, 128) vector pass, reducing to per-cluster open FLAGS (C, 1);
2. masks the per-octant PACKED VISIT KEYS (bvh.MeshAccel.cl_okey:
   rank<<16 | id, front-to-back for the subtile's dominant direction
   octant) with the flags, and
3. runs a fori_loop that MIN-EXTRACTS the next key each iteration — one
   vector reduce per OPENED cluster — and tests that cluster's K triangles
   as ONE dense (K, S, 128) broadcast block from the packed table
   `accel.tri_pack` (triangles on the leading axis, rays on sublane x
   lane) — Moller-Trumbore at near-peak VPU throughput, with winner
   resolution behind an any-win cond.

Min-extraction replaced round 2's scalar compaction scan (one scalar
load/test/conditional-store per CLUSTER, ~100 ns each, ~2 ms per trace on
the 96-cluster chair — the single largest cost in the frame).  Per-cluster
scalar branching is equally wrong (measured round 1: K=32 halved the
triangle math per open yet traced slower because twice as many conds ran);
paying one ~0.4 us reduce per *opened* cluster is the cheap corner —
opens are few (2-3 coherent primaries, ~10 sorted bounces) while C grows
with the scene.

Analytic spheres (always few: the reference's user geometry,
EmbreeBackend.cpp:139-178) are an unrolled pass run FIRST, so sphere hits
tighten the slab bounds before any cluster is opened.

Kernels:
- closest_hit: full Hit record (t, geometric normal, material, kind).
- any_hit: boolean occlusion with per-lane tmax (shadow rays, Light.cpp:16-40)
  and whole-subtile early exit once every lane is blocked.

This pair replaces rtcIntersect1/rtcOccluded1 over Embree's committed BVH
(EmbreeBackend.cpp:181) and optixTrace over the GAS/IAS builds
(OptixBackend.cpp:916-1180).
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

from spt_tpu.ops.bvh import MAX_RESIDENT_TRIS  # noqa: F401  (routing limit)
from spt_tpu.ops.bvh import NS_STEP as bvh_NS_STEP

LANES = 128
SUBTILE_ROWS = 8

_BIG = np.float32(1e30)
_MT_EPS = 1e-9


def _inv_dir(dx):
    """Safe reciprocal: zero components -> huge (slab test still correct
    because (lo - o) * inf keeps its sign)."""
    return jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, jnp.where(dx >= 0, _BIG, -_BIG))


# numpy scalars: weak-typed literals, not captured device constants
_OKEY_MISS = np.int32(0x7FFFFFFF)
_OKEY_ID_MASK = np.int32(0xFFFF)


def _box_flags(lo, hi, o3, inv3, tmin, bound):
    """Slab-test all B boxes against the whole (S, L) ray subtile in one
    (B, S, L) broadcast pass; returns per-box any-lane-hit flags (B, 1)
    bool.  lo/hi: (B, 3) VMEM tables; o3/inv3: (1, S, L) ray planes;
    bound: (1, S, L) per-lane upper bound (min of tmax and current best).

    (A shrinking-bound recheck in the open loop — skip clusters whose
    nearest entry lies behind every lane's best — was tried and REMOVED:
    the scalar bound is max over lanes, and any lane that misses everything
    keeps it at tmax forever, so the cond's vector->scalar sync per open
    cost ~2 ms/frame on the chair and skipped almost nothing.)"""
    b = lo.shape[0]

    def c3(tab, i):
        return tab[:, i:i + 1].reshape(b, 1, 1)

    t0x = (c3(lo, 0) - o3[0]) * inv3[0]
    t1x = (c3(hi, 0) - o3[0]) * inv3[0]
    t0y = (c3(lo, 1) - o3[1]) * inv3[1]
    t1y = (c3(hi, 1) - o3[1]) * inv3[1]
    t0z = (c3(lo, 2) - o3[2]) * inv3[2]
    t1z = (c3(hi, 2) - o3[2]) * inv3[2]
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), bound),
    )
    hit = tnear <= tfar                              # (B, S, L)
    any_lane = jnp.any(hit, axis=2)                  # (B, S)
    return jnp.any(any_lane, axis=1, keepdims=True)  # (B, 1)


def _box_flag1(lo, hi, i, o3, inv3, tmin, bound):
    """Single-box slab test against the whole (S, L) ray subtile; returns
    a scalar bool (any lane hits box i).

    This is NOT _box_flags with B=1: Mosaic cannot lower that variant on
    hardware — the (1,1,1)->(1,S,L) vector.broadcast out of a dynamically
    sliced one-row load hits "Not implemented: Broadcast in both sublanes
    and lanes" (tools/repro_mosaic_constructs.py case A), while dynamic
    scalar element reads (case C) and scalar->vector broadcasts (case B)
    lower fine.  So the one-box recheck reads the six bounds as scalars.
    lo/hi: (B, 3) VMEM refs; i: dynamic row index."""
    t0x = (lo[i, 0] - o3[0]) * inv3[0]
    t1x = (hi[i, 0] - o3[0]) * inv3[0]
    t0y = (lo[i, 1] - o3[1]) * inv3[1]
    t1y = (hi[i, 1] - o3[1]) * inv3[1]
    t0z = (lo[i, 2] - o3[2]) * inv3[2]
    t1z = (hi[i, 2] - o3[2]) * inv3[2]
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), bound),
    )
    return jnp.any(tnear <= tfar)



def _reflag_at() -> int:
    """One VECTORIZED re-cull of an open loop's remaining cluster visit
    list after the Nth open (SPT_INST_REFLAG=N; default 0 = OFF) —
    shared by the resident tier here and the instanced rounds tiers
    (ops/pallas_inst, where the full rationale lives): one broadcast
    flag pass against the bound tightened by the round's first opens,
    using each lane's OWN bound — the per-lane reductions the refuted
    per-open scalar recheck and whole-tile exit could not reach at
    acceptable cost.  Culls are radiometrically invisible (containment:
    an empty box-interval admits no strictly closer hit) and
    equality-tested; but MEASURED on bigmesh the variant is the THIRD
    net loss chasing this headroom — N=2: 52.85, N=1: 52.99, N=4:
    53.92 vs 52.53 ms/frame off — so it ships default-off like the
    per-open recheck.  The broadcast re-cull costs ~a full flag pass on
    EVERY round (including the many whose visit lists are already
    short), and the opens it cancels are exactly the late, mostly-dead
    ones the sub-block test already skates through; the sim counts
    opens, not open COST (the same divergence that killed the
    recheck)."""
    import os

    try:
        return int(os.environ.get("SPT_INST_REFLAG", "0"))
    except ValueError:
        return 0


def _visit_keys(flags, cl_okey, oct_):
    """(count, key0): the flagged clusters as a (C, 1) packed-key vector.

    key[c] = (front-to-back rank << 16) | c for flagged clusters, INT32_MAX
    otherwise.  The open loops repeatedly min-extract: one vector reduce
    per OPENED cluster, replacing the old per-cluster scalar compaction
    scan (which cost ~100 ns x C per trace and dominated mesh frames —
    ~2 ms of the chair's per-trace cost was this scan)."""
    count = jnp.sum(flags.astype(jnp.int32))
    key0 = jnp.where(flags, cl_okey[oct_], _OKEY_MISS)
    return count, key0


def _unpack_col(blk, i, k):
    return blk[:, i:i + 1].reshape(k, 1, 1)


_SUB_K = 8


def _sub_k(k: int) -> int:
    """Sub-block row count for the triangle block test (SPT_TRACE_SUBK
    overrides for experiments; must divide K, else the full block is one
    sub-block).

    Why sub-blocks: the full (K, S, L) Moller-Trumbore materializes ~16
    (64, 8, 128) f32 intermediates — 4 MB of VMEM spill traffic per opened
    cluster, which measured as the binding cost (~1.6 us/open at ~4 TB/s;
    changing the flop count was a wash).  Testing KB=8 rows at a time keeps
    each intermediate at vreg scale so the chain stays in registers, and
    only the (S, L) running minimum crosses sub-blocks."""
    import os

    try:
        kb = int(os.environ.get("SPT_TRACE_SUBK", _SUB_K))
    except ValueError:
        kb = _SUB_K
    if kb <= 0 or k % kb:
        return k
    return kb


def _unpack_sub(blk, i, k0, kb):
    return blk[k0:k0 + kb, i:i + 1]


def _flat2(planes):
    """(1, S, L) ray planes -> (1, S*L): the sub-block test runs on flat
    2-D shapes — Mosaic lowers (KB, 1) x (1, S*L) broadcasts ~26 % faster
    than the equivalent (KB, 1, 1) x (1, S, L) 3-D forms (measured,
    tools/bench_trace_parts opens vs opens2d)."""
    return tuple(p.reshape(1, p.shape[-2] * p.shape[-1]) for p in planes)


def _tri_sub_test(blk, k0, kb, o2, d2, tmin, tmax2):
    """Moller-Trumbore of packed rows [k0, k0+kb) against the whole subtile:
    (KB, 1) triangle columns x (1, S*L) flat ray planes -> (KB, S*L).

    Returns (ok, t, u, v): per-(triangle, lane) acceptance, distance and
    barycentrics.  Packed layout: bvh.MeshAccel.tri_pack."""
    v0x, v0y, v0z = (_unpack_sub(blk, i, k0, kb) for i in (0, 1, 2))
    e1x, e1y, e1z = (_unpack_sub(blk, i, k0, kb) for i in (3, 4, 5))
    e2x, e2y, e2z = (_unpack_sub(blk, i, k0, kb) for i in (6, 7, 8))
    ox, oy, oz = o2
    dx, dy, dz = d2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    inv = 1.0 / jnp.where(jnp.abs(a) > _MT_EPS, a, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = inv * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = inv * (dx * qx + dy * qy + dz * qz)
    t = inv * (e2x * qx + e2y * qy + e2z * qz)
    ok = (
        (jnp.abs(a) > _MT_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax2)
    )
    return ok, t, u, v


def _tri_block_test(blk, k, o3, d3, tmin, tmax3):
    """Whole-cluster Moller-Trumbore -> (K, S, L) planes (materializes the
    full block; prefer the sub-blocked folds below on the hot paths)."""
    s, l = o3[0].shape[-2], o3[0].shape[-1]
    o2, d2 = _flat2(o3), _flat2(d3)
    (tmax2,) = _flat2((tmax3,))
    ok, t, u, v = _tri_sub_test(blk, 0, k, o2, d2, tmin, tmax2)
    return (ok.reshape(k, s, l), t.reshape(k, s, l),
            u.reshape(k, s, l), v.reshape(k, s, l))


def tri_block_min(blk, k, s, l, o3, d3, tmin, tmax3, with_bary: bool):
    """Sub-blocked closest-distance pass over one packed cluster.

    Returns (tm, wi[, pu, pv]): per-lane (S, L) minimum hit distance (_BIG
    when no row hits), the winning packed row index (-1 none; ties resolve
    to the highest row, matching the old whole-block argmax), and the
    winner's barycentrics when `with_bary` (texture uv interpolation
    and/or shading-normal interpolation both consume them).  Each
    sub-block's ~16 intermediates stay at vreg scale instead of spilling a
    (K, S, L) chain through VMEM (see _sub_k), and all math runs on flat
    (KB, S*L) 2-D shapes (see _flat2)."""
    kb = _sub_k(k)
    sl = s * l
    o2, d2 = _flat2(o3), _flat2(d3)
    (tmax2,) = _flat2((tmax3,))
    iota_kb = jax.lax.broadcasted_iota(jnp.int32, (kb, sl), 0)
    tm = jnp.full((1, sl), _BIG)
    wi = jnp.full((1, sl), -1, jnp.int32)
    pu = pv = None
    if with_bary:
        pu = jnp.zeros((1, sl), jnp.float32)
        pv = jnp.zeros((1, sl), jnp.float32)
    for k0 in range(0, k, kb):
        ok, t, bu, bv = _tri_sub_test(blk, k0, kb, o2, d2, tmin, tmax2)
        tb = jnp.where(ok, t, _BIG)
        tm_s = jnp.min(tb, axis=0, keepdims=True)
        # ties within the sub-block: highest row wins (old behavior); ties
        # ACROSS sub-blocks: improvement is strict, so the first sub-block
        # with the minimum keeps it.  Caveat: equal-t rows are only truly
        # interchangeable when they share material/uv — exactly-coplanar
        # DUPLICATE triangles with different attributes may resolve to a
        # different winner than the old whole-block argmax (an accepted
        # don't-care: such geometry is z-fighting in any renderer).
        eq = tb == tm_s
        wi_s = jnp.max(jnp.where(eq, iota_kb + k0, -1), axis=0,
                       keepdims=True)
        improved = tm_s < tm
        if with_bary:
            uniq = eq & ((iota_kb + k0) == wi_s)
            pu = jnp.where(improved,
                           jnp.sum(jnp.where(uniq, bu, 0.0), 0,
                                   keepdims=True), pu)
            pv = jnp.where(improved,
                           jnp.sum(jnp.where(uniq, bv, 0.0), 0,
                                   keepdims=True), pv)
        wi = jnp.where(improved, wi_s, wi)
        tm = jnp.where(improved, tm_s, tm)
    out = (tm.reshape(s, l), wi.reshape(s, l))
    if with_bary:
        out = out + (pu.reshape(s, l), pv.reshape(s, l))
    return out


def tri_block_any(blk, k, o3, d3, tmin, tmax3, blocked):
    """Sub-blocked any-hit pass: ORs each sub-block's row-reduced acceptance
    into `blocked` ((S, L) int32) without materializing the full block;
    flat 2-D math (see _flat2)."""
    kb = _sub_k(k)
    s, l = blocked.shape
    o2, d2 = _flat2(o3), _flat2(d3)
    (tmax2,) = _flat2((tmax3,))
    acc = blocked.reshape(1, s * l)
    for k0 in range(0, k, kb):
        ok, _, _, _ = _tri_sub_test(blk, k0, kb, o2, d2, tmin, tmax2)
        acc = acc | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
    return acc.reshape(s, l)


def _sphere_pass_closest(n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax):
    """Unrolled scalar sphere loop on the (S, L) subtile; returns the initial
    best-hit carry (t, mat, kind, ax, ay, az) plus rinv (sphere-only)."""
    shp = o.x.shape
    best_t = jnp.full(shp, _BIG)
    best_mat = jnp.zeros(shp, jnp.int32)
    best_kind = jnp.zeros(shp, jnp.int32)
    ax = jnp.zeros(shp, jnp.float32)
    ay = jnp.zeros(shp, jnp.float32)
    az = jnp.zeros(shp, jnp.float32)
    rinv = jnp.zeros(shp, jnp.float32)
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
        ok = (disc > 0.0) & (r > 0.0) & (t > tmin) & (t < tmax) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_mat = jnp.where(ok, sph_m[i, 0], best_mat)
        best_kind = jnp.where(ok, isect.KIND_SPHERE, best_kind)
        ax = jnp.where(ok, cx, ax)
        ay = jnp.where(ok, cy, ay)
        az = jnp.where(ok, cz, az)
        rinv = jnp.where(ok, 1.0 / jnp.maximum(r, 1e-12), rinv)
    return (best_t, best_mat, best_kind, ax, ay, az), rinv


def make_cluster_opener(k, s, l, o3, d3, tmin, tmax3, with_uv: bool,
                        finish=None, with_ns: bool = False):
    """Build `open_cluster(blk, carry) -> carry`: Moller-Trumbore one packed
    (K, 24|28) cluster block against the subtile and fold any winners into
    the closest-hit carry (t, mat, kind, ax, ay, az[, uvx, uvy]).

    Shared by the VMEM tracer (blocks read straight from the resident
    tri_pack), the HBM-streaming tracer (blocks DMA'd per supercluster,
    ops/pallas_stream), and the instanced tracer (ops/pallas_inst), whose
    `finish(mat, nx, ny, nz, geom)` hook remaps the winning material
    (instance override) and transforms the object-space normal to world
    space before it is folded into the carry — `geom` flags lanes whose
    normal is the winding-derived cross product (which picks up the
    instance's sign(det)) rather than an interpolated vertex normal
    (which must NOT: vertex normals transform by the pure
    inverse-transpose, EmbreeBackend.cpp:60-79).

    `with_ns`: the block carries 12-bit-packed shading normals (cols 19-23,
    bvh.PACK_NS); the winner's normal becomes n0 + u*dn1 + v*dn2, with a
    per-lane fallback to the geometric normal where the mesh packed
    zeros (no NORMAL attribute)."""
    kb = _sub_k(k)
    iota_kb = jax.lax.broadcasted_iota(jnp.int32, (kb, s * l), 0)
    with_bary = with_uv or with_ns

    def open_cluster(blk, carry):
        best_t = carry[0]
        res = tri_block_min(blk, k, s, l, o3, d3, tmin, tmax3, with_bary)
        tm, wi = res[0], res[1]
        win = tm < best_t

        # Winner resolution behind a cond: most opened clusters improve no
        # lane (especially for incoherent bounce rays), and the masked
        # column-picking passes cost ~3x the vector->scalar sync of the
        # any() predicate (both measured).
        def resolve(carry):
            best_t, best_mat, best_kind, ax, ay, az = carry[:6]
            wi2 = wi.reshape(1, s * l)

            def pick(i):
                acc = jnp.zeros((1, s * l), jnp.float32)
                for k0 in range(0, k, kb):
                    msk = (iota_kb + k0) == wi2
                    col = _unpack_sub(blk, i, k0, kb)
                    acc = acc + jnp.sum(jnp.where(msk, col, 0.0), axis=0,
                                        keepdims=True)
                return acc.reshape(s, l)

            pmat = pick(12).astype(jnp.int32)
            pnx, pny, pnz = pick(9), pick(10), pick(11)
            geom = None
            if with_ns:
                pu, pv = res[2], res[3]
                # 12-bit packed [n0 | dn1 | dn2] in cols 19-23 (bvh.encode_ns):
                # five picks instead of the nine a float layout pays; the
                # split-back (floor(p/4096), p - hi*4096) and the dequant are
                # exact float32, so this reconstructs bvh.decode_ns — the
                # values flatten stores in tri_ns for the XLA paths/oracle —
                # bit-for-bit.
                p0, p1, p2, p3, p4 = (pick(19), pick(20), pick(21),
                                      pick(22), pick(23))
                # all-zero planes = the no-NORMAL sentinel row (real
                # encodings keep every field >= 1, so the packed column is
                # >= 4097); sums of non-negative floats round to 0 only
                # when every term is 0.
                allz = (p0 + p1 + p2 + p3 + p4) <= 0.0

                def split(p):
                    h = jnp.floor(p * np.float32(1.0 / 4096.0))
                    return h, p - h * np.float32(4096.0)

                def dq(q):
                    return ((q - np.float32(1.0)) * bvh_NS_STEP
                            - np.float32(2.0))

                n0x_q, n0y_q = split(p0)
                n0z_q, d1x_q = split(p1)
                d1y_q, d1z_q = split(p2)
                d2x_q, d2y_q = split(p3)
                d2z_q, _ = split(p4)
                snx = dq(n0x_q) + pu * dq(d1x_q) + pv * dq(d2x_q)
                sny = dq(n0y_q) + pu * dq(d1y_q) + pv * dq(d2y_q)
                snz = dq(n0z_q) + pu * dq(d1z_q) + pv * dq(d2z_q)
                # sentinel rows (mesh without NORMALs) and degenerate
                # interpolations keep the geometric normal
                geom = allz | (snx * snx + sny * sny + snz * snz <= 1e-12)
                pnx = jnp.where(geom, pnx, snx)
                pny = jnp.where(geom, pny, sny)
                pnz = jnp.where(geom, pnz, snz)
            if finish is not None:
                pmat, pnx, pny, pnz = finish(pmat, pnx, pny, pnz, geom)
            best_mat = jnp.where(win, pmat, best_mat)
            ax = jnp.where(win, pnx, ax)
            ay = jnp.where(win, pny, ay)
            az = jnp.where(win, pnz, az)
            best_kind = jnp.where(win, isect.KIND_TRIANGLE, best_kind)
            best_t = jnp.where(win, tm, best_t)
            out = (best_t, best_mat, best_kind, ax, ay, az)
            if with_uv:
                uvx, uvy = carry[6], carry[7]
                pu, pv = res[2], res[3]
                texu = pick(13) + pu * pick(15) + pv * pick(17)
                texv = pick(14) + pu * pick(16) + pv * pick(18)
                out = out + (jnp.where(win, texu, uvx),
                             jnp.where(win, texv, uvy))
            return out

        return jax.lax.cond(jnp.any(win), resolve, lambda cr: cr, carry)

    return open_cluster


def closest_epilogue(out_carry, o, d, rinv, with_uv: bool):
    """Shared closest-hit tail: sphere normals from centers, miss ->
    effectively-inf t.  Returns the output value planes."""
    best_t, best_mat, best_kind, ax, ay, az = out_carry[:6]

    hitm = best_kind != isect.KIND_MISS
    t_safe = jnp.where(hitm, best_t, 0.0)
    is_sph = best_kind == isect.KIND_SPHERE
    px = o.x + t_safe * d.x
    py = o.y + t_safe * d.y
    pz = o.z + t_safe * d.z
    out = (jnp.where(hitm, best_t, _BIG * 1e7),  # becomes inf downstream
           jnp.where(is_sph, (px - ax) * rinv, ax),
           jnp.where(is_sph, (py - ay) * rinv, ay),
           jnp.where(is_sph, (pz - az) * rinv, az),
           best_mat,
           best_kind)
    if with_uv:
        out = out + (out_carry[6], out_carry[7])
    return out


def closest_hit_tile(accel_refs, n_clusters, k, n_sph, tmin,
                     sph_c, sph_r, sph_m, o, d, tmax, with_uv: bool = False):
    """Full closest-hit for one (S, L) ray tile inside a Pallas kernel:
    sphere pass + flags + min-extraction cluster loop.

    `accel_refs` = (cl_lo, cl_hi, tri_pack, cl_okey) VMEM refs.
    o/d: Vec3 of (S, L) values; tmax: (S, L).  Returns the (t, nx, ny, nz,
    mat, kind) value planes — plus (uvx, uvy) interpolated texture
    coordinates when `with_uv` (textured scenes; pack cols 13-18 hold
    uv0|duv1|duv2) — with t = _BIG * 1e7 on miss (inf downstream).
    Reused by the standalone trace kernels AND the fused bounce/frame
    kernels (ops/pallas_bounce) so mesh scenes keep path state in VMEM."""
    cl_lo, cl_hi, tri_pack, cl_okey = accel_refs
    s, l = o.x.shape
    # the static pack width carries the shading-normal flag (bvh.PACK_NS)
    with_ns = tri_pack.shape[-1] > 24
    oct_ = ((jnp.sum(d.x) < 0).astype(jnp.int32) * 4
            + (jnp.sum(d.y) < 0).astype(jnp.int32) * 2
            + (jnp.sum(d.z) < 0).astype(jnp.int32))

    carry0, rinv = _sphere_pass_closest(
        n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax
    )
    if with_uv:
        zero_sl = jnp.zeros(o.x.shape, jnp.float32)
        carry0 = carry0 + (zero_sl, zero_sl)

    ix, iy, iz = _inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z)
    o3 = (o.x.reshape(1, s, l), o.y.reshape(1, s, l), o.z.reshape(1, s, l))
    d3 = (d.x.reshape(1, s, l), d.y.reshape(1, s, l), d.z.reshape(1, s, l))
    inv3 = (ix.reshape(1, s, l), iy.reshape(1, s, l), iz.reshape(1, s, l))
    bound = jnp.minimum(tmax, carry0[0]).reshape(1, s, l)
    flags = _box_flags(cl_lo, cl_hi, o3, inv3, tmin, bound)
    count, key0 = _visit_keys(flags, cl_okey, oct_)

    open_cluster = make_cluster_opener(k, s, l, o3, d3, tmin,
                                       tmax.reshape(1, s, l), with_uv,
                                       with_ns=with_ns)

    def open_body(j, key_and_carry):
        key, carry = key_and_carry[0], key_and_carry[1:]
        m = jnp.min(key)
        carry = open_cluster(tri_pack[m & _OKEY_ID_MASK], carry)
        return (jnp.where(key == m, _OKEY_MISS, key),) + carry

    reflag_n = _reflag_at()
    if reflag_n > 0:
        # One vectorized re-cull of the remaining visit list after the
        # Nth open (same mechanism and containment argument as the
        # instanced tier, pallas_inst._reflag_at — the flag pass above
        # used the PRE-open bound, and front-to-back order makes the
        # first opens the ones that tighten per-lane bounds most).
        # Min-terminated: the re-cull kills keys, so the static `count`
        # no longer bounds the loop.
        def rcond(kc):
            return kc[0] != _OKEY_MISS

        def rbody(kc):
            m, key, it = kc[0], kc[1], kc[2]
            carry = kc[3:]
            carry = open_cluster(tri_pack[m & _OKEY_ID_MASK], carry)
            key = jnp.where(key == m, _OKEY_MISS, key)

            def reflag(ky):
                bnow = jnp.minimum(tmax, carry[0]).reshape(1, s, l)
                cf = _box_flags(cl_lo, cl_hi, o3, inv3, tmin, bnow)
                return jnp.where(cf, ky, _OKEY_MISS)

            key = jax.lax.cond(it == reflag_n, reflag, lambda ky: ky, key)
            return (jnp.min(key), key, it + 1) + carry

        out_carry = jax.lax.while_loop(
            rcond, rbody, (jnp.min(key0), key0, jnp.int32(1)) + carry0)[3:]
    else:
        out_carry = jax.lax.fori_loop(0, count, open_body,
                                      (key0,) + carry0)[1:]
    return closest_epilogue(out_carry, o, d, rinv, with_uv)


def _closest_kernel(n_clusters, k, n_sph, tmin, with_uv,
                    ox, oy, oz, dx, dy, dz, tmaxr,
                    cl_lo, cl_hi, tri_pack, cl_okey,
                    sph_c, sph_r, sph_m,
                    *outs):
    if with_uv:
        (out_t, out_nx, out_ny, out_nz, out_mat, out_kind,
         out_uvx, out_uvy) = outs
    else:
        out_t, out_nx, out_ny, out_nz, out_mat, out_kind = outs
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    res = closest_hit_tile(
        (cl_lo, cl_hi, tri_pack, cl_okey),
        n_clusters, k, n_sph, tmin, sph_c, sph_r, sph_m, o, d, tmaxr[:],
        with_uv=with_uv,
    )
    out_t[:], out_nx[:], out_ny[:], out_nz[:] = res[0], res[1], res[2], res[3]
    out_mat[:], out_kind[:] = res[4], res[5]
    if with_uv:
        out_uvx[:], out_uvy[:] = res[6], res[7]


def _sphere_pass_any(n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax):
    blocked = jnp.zeros(o.x.shape, jnp.int32)
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
        blocked = blocked | hit.astype(jnp.int32)
    return blocked


def any_hit_tile(accel_refs, n_clusters, k, n_sph, tmin,
                 sph_c, sph_r, sph_m, o, d, tmax):
    """Occlusion for one (S, L) ray tile inside a Pallas kernel: sphere pass
    + flags + min-extraction cluster loop with whole-subtile early exit once
    every lane is blocked.  Returns (S, L) int32 blocked flags.  Same ref
    contract as closest_hit_tile.  The visit keys are front-to-back, so near
    blockers saturate the subtile sooner and the early exit fires earlier."""
    cl_lo, cl_hi, tri_pack, cl_okey = accel_refs
    s, l = o.x.shape
    oct_ = ((jnp.sum(d.x) < 0).astype(jnp.int32) * 4
            + (jnp.sum(d.y) < 0).astype(jnp.int32) * 2
            + (jnp.sum(d.z) < 0).astype(jnp.int32))

    blocked0 = _sphere_pass_any(n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax)
    # Masked-out lanes (tmax <= tmin: dead paths, non-contributing shadow
    # rays) can never test as blocked, which would pin the all-blocked early
    # exit off for every mixed tile.  Count them as blocked up front — their
    # result is ignored by every caller (transport.shade_core masks with
    # contrib_mask), and the exit then fires as soon as the LIVE lanes are
    # occluded.
    blocked0 = blocked0 | (tmax <= tmin).astype(jnp.int32)

    def traced(blocked0):
        ix, iy, iz = _inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z)
        o3 = (o.x.reshape(1, s, l), o.y.reshape(1, s, l), o.z.reshape(1, s, l))
        d3 = (d.x.reshape(1, s, l), d.y.reshape(1, s, l), d.z.reshape(1, s, l))
        inv3 = (ix.reshape(1, s, l), iy.reshape(1, s, l), iz.reshape(1, s, l))
        bound = tmax.reshape(1, s, l)
        flags = _box_flags(cl_lo, cl_hi, o3, inv3, tmin, bound)
        count, key0 = _visit_keys(flags, cl_okey, oct_)

        # while over the visit keys: early exit once every lane is blocked
        def cond(carry):
            j, _, blocked = carry
            return (j < count) & ~jnp.all(blocked != 0)

        def body(carry):
            j, key, blocked = carry
            m = jnp.min(key)
            blk = tri_pack[m & _OKEY_ID_MASK]
            return (j + 1, jnp.where(key == m, _OKEY_MISS, key),
                    tri_block_any(blk, k, o3, d3, tmin, bound, blocked))

        _, _, blocked = jax.lax.while_loop(
            cond, body, (jnp.int32(0), key0, blocked0))
        return blocked

    # Whole-subtile skip: a tile whose every lane is dead or non-contributing
    # (tmax <= tmin — e.g. all primaries missed, so no shadow ray has a real
    # interval) skips the flags broadcast AND the C-iteration scalar scan
    # entirely.  On miss-dominated mesh scenes ~85-90 % of subtiles take this
    # path for every shadow trace.
    return jax.lax.cond(jnp.all(blocked0 != 0), lambda b: b, traced, blocked0)


def _any_kernel(n_clusters, k, n_sph, tmin,
                ox, oy, oz, dx, dy, dz, tmaxr,
                cl_lo, cl_hi, tri_pack, cl_okey,
                sph_c, sph_r, sph_m,
                out_blocked):
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    out_blocked[:] = any_hit_tile(
        (cl_lo, cl_hi, tri_pack, cl_okey),
        n_clusters, k, n_sph, tmin, sph_c, sph_r, sph_m, o, d, tmaxr[:],
    )


def _common_call(kernel, accel, scene, o: Vec3, d: Vec3, tmin, tmax,
                 out_shapes, out_specs_count, extra_statics=()):
    n = o.x.shape[0]
    rows = n // LANES
    shape2 = (rows, LANES)
    tile_rows = _divisor(rows)

    def r2(a):
        return a.reshape(shape2)

    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    state = [r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z), r2(tmax_arr)]
    tables = [accel.cluster_lo, accel.cluster_hi, accel.tri_pack,
              accel.cl_okey,
              scene.sph_center, scene.sph_radius.reshape(-1, 1),
              scene.sph_mat.reshape(-1, 1)]

    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(a):
        return pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
                            memory_space=pltpu.VMEM)

    k = accel.cluster_size
    kern = functools.partial(
        kernel, accel.num_clusters, k, scene.num_spheres, np.float32(tmin),
        *extra_statics
    )
    outs = pl.pallas_call(
        kern,
        grid=(rows // tile_rows,),
        in_specs=[block] * 7 + [table_spec(a) for a in tables],
        out_specs=[block] * out_specs_count,
        out_shape=[jax.ShapeDtypeStruct(shape2, dt) for dt in out_shapes],
    )(*state, *tables)
    return outs, n


def _divisor(rows: int) -> int:
    """Multiple-of-8 divisor (Mosaic sublane constraint), else whole array."""
    for cand in range(min(SUBTILE_ROWS, rows) // 8 * 8, 0, -8):
        if rows % cand == 0:
            return cand
    return rows


def closest_hit(accel, scene, o: Vec3, d: Vec3, tmin=0.0, tmax=np.float32(np.inf)):
    """Pallas cluster-culled closest hit -> isect.HitV (with interpolated
    texture uv when the scene is textured)."""
    tmax = np.float32(min(float(tmax), 1e30)) if isinstance(tmax, (int, float)) else tmax
    with_uv = scene.textures is not None
    f32, i32 = jnp.float32, jnp.int32
    out_shapes = [f32, f32, f32, f32, i32, i32] + ([f32, f32] if with_uv else [])
    outs, n = _common_call(
        _closest_kernel, accel, scene, o, d, tmin, tmax,
        out_shapes=out_shapes,
        out_specs_count=len(out_shapes),
        extra_statics=(with_uv,),
    )
    outs = [x.reshape(n) for x in outs]
    t, nx, ny, nz, mat, kind = outs[:6]
    t = jnp.where(kind != isect.KIND_MISS, t, jnp.float32(jnp.inf))
    return isect.HitV(t=t, normal=Vec3(nx, ny, nz), mat_id=mat, kind=kind,
                      uvx=outs[6] if with_uv else None,
                      uvy=outs[7] if with_uv else None)


def any_hit(accel, scene, o: Vec3, d: Vec3, tmin=0.0, tmax=np.float32(np.inf)):
    """Pallas cluster-culled occlusion -> (N,) bool.

    Contract note: lanes with an empty interval (tmax <= tmin) report
    *blocked*, not unoccluded — the tile helper counts them as blocked up
    front so the whole-subtile early exit can fire (see any_hit_tile).
    Every in-tree caller masks such lanes out (shade_core's contrib mask),
    so only the flag for empty-interval rays is affected.
    """
    tmax = np.float32(min(float(tmax), 1e30)) if isinstance(tmax, (int, float)) else tmax
    outs, n = _common_call(
        _any_kernel, accel, scene, o, d, tmin, tmax,
        out_shapes=[jnp.int32],
        out_specs_count=1,
    )
    return outs[0].reshape(n) != 0
