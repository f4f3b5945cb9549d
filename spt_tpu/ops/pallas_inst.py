"""Instanced two-level trace kernels: a TLAS of instances over shared BLAS.

The reference's OptiX backend builds one GAS per mesh and an IAS of
transformed instances over them (OptixBackend.cpp:916-1034, instances at
:1036-1180); hardware traversal rewrites each ray into object space at the
instance node.  The TPU translation (structures in ops/bvh.InstAccel):

Per (S, L) ray subtile:

1. slab-test the I instance WORLD AABBs in one (I, S, L) broadcast pass;
2. min-extract opened instances front-to-back (inst_okey packed
   rank<<16|id keys per ray-direction octant, the cluster-traversal trick);
3. per opened instance: 14 scalar reads fetch object_from_world, then the
   whole subtile transforms into object space (one fused VPU pass — the
   direction is NOT normalized, so t along the transformed ray equals
   world t and the closest-hit carry folds across instances without any
   rescaling), and the usual cluster traversal (flags + min-extraction +
   Moller-Trumbore block tests, shared with ops/pallas_trace) runs over
   that mesh's BLAS range.  Winning normals transform back through the
   inverse-transpose (= R_ofw^T) and the instance material override
   applies inside the winner resolution (make_cluster_opener's `finish`).

Unlike the HBM-streaming tier (ops/pallas_stream) there is no DMA: the
point of instancing is that the UNIQUE geometry is small enough to sit
resident in VMEM even when the flattened world-space scene is many times
the budget.  VMEM cost is O(M * CMAX * K) for the shared BLAS regardless
of instance count; per-tile work tracks the instances the tile actually
overlaps.

Same call contracts as pallas_trace.closest_hit / any_hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.ops import intersect as isect
from spt_tpu.ops.pallas_stream import _octant, _ray_planes
from spt_tpu.ops.pallas_trace import (
    LANES,
    _OKEY_ID_MASK,
    _OKEY_MISS,
    _box_flag1,
    _box_flags,
    _divisor,
    _sphere_pass_any,
    _sphere_pass_closest,
    _visit_keys,
    closest_epilogue,
    make_cluster_opener,
    tri_block_any,
)
from spt_tpu.ops.vec3 import Vec3


def _read_inst(inst_tab, i):
    """One opened instance's row: (r[12] object_from_world scalars —
    R row-major then translation — , mesh index, material override)."""
    r = [inst_tab[i, c] for c in range(12)]
    mesh = inst_tab[i, 12].astype(jnp.int32)
    mat_ov = inst_tab[i, 13].astype(jnp.int32)
    sg = inst_tab[i, 14]
    return r, mesh, mat_ov, sg


def _xform_rays(r, o: Vec3, d: Vec3):
    """World rays -> object space: o' = R o + t, d' = R d (unnormalized —
    preserving the t parameterization is what lets one closest-hit carry
    fold across instances)."""
    oo = Vec3(
        r[0] * o.x + r[1] * o.y + r[2] * o.z + r[9],
        r[3] * o.x + r[4] * o.y + r[5] * o.z + r[10],
        r[6] * o.x + r[7] * o.y + r[8] * o.z + r[11],
    )
    dd = Vec3(
        r[0] * d.x + r[1] * d.y + r[2] * d.z,
        r[3] * d.x + r[4] * d.y + r[5] * d.z,
        r[6] * d.x + r[7] * d.y + r[8] * d.z,
    )
    return oo, dd


def _make_finish(r, mat_ov, sg):
    """Winner-resolution hook: instance material override + normal back to
    world space via the inverse-transpose, n_w = sign(det) * R_ofw^T n_o
    (the sign keeps mirrored instances oriented like the flattened path's
    world-space cross product; downstream normalizes,
    transport.shade_core).  Interpolated VERTEX normals (geom False) take
    the pure inverse-transpose — the cross product picks up det's sign
    from the winding, a vertex normal field does not
    (EmbreeBackend.cpp:60-79)."""

    def finish(mat, nx, ny, nz, geom=None):
        s = sg if geom is None else jnp.where(geom, sg, jnp.float32(1.0))
        return (
            jnp.where(mat_ov >= 0, mat_ov, mat),
            s * (r[0] * nx + r[3] * ny + r[6] * nz),
            s * (r[1] * nx + r[4] * ny + r[7] * nz),
            s * (r[2] * nx + r[5] * ny + r[8] * nz),
        )

    return finish


def _rounds_on() -> bool:
    import os

    return os.environ.get("SPT_INST_ROUNDS", "1") != "0"


def _hybrid_on() -> bool:
    """Runtime union-at-bounce-0 hybrid (SPT_INST_HYBRID=0 disables):
    engages only when the caller threads the traced bounce scalar (the
    fused kernels do; standalone calls default to rounds only)."""
    import os

    return os.environ.get("SPT_INST_HYBRID", "1") != "0"


def _recheck_on() -> bool:
    """Mid-round per-open recheck (SPT_INST_RECHECK=1 opts in): re-slab one
    cluster box against the CURRENT per-lane bound before its block test.
    The bigmesh sim put the converged-limit open reduction at ~40 %
    (tools/bigmesh_sim.py rounds inf vs oracle), but MEASURED on the real
    TPU the variant is a NET LOSS — bigmesh 51.9 vs 49.8 ms/frame: the
    per-open scalar slab + lax.cond costs more than the skipped block
    tests return, because by the time the bound has converged most
    remaining opens are already cheap (few live sub-blocks).  Kept as a
    gated negative result; parity test TestInstRecheck."""
    import os

    return os.environ.get("SPT_INST_RECHECK", "0") == "1"


def _reflag_at() -> int:
    """One VECTORIZED re-cull of a round's remaining cluster visit list
    after the Nth open (SPT_INST_REFLAG=N; 0 disables): recompute the
    (C, S, L) broadcast flag pass against the bound tightened by the
    round's first opens and MISS-out every no-longer-reachable key.

    This chases the same converged-bound headroom as the two refuted
    mechanisms (docs/DESIGN.md "Where the bigmesh frame's time goes") at
    a different cost point: the per-open scalar recheck paid six dynamic
    scalar reads + a lax.cond per OPEN (measured net loss), and the
    whole-tile early exit keyed on the max-over-lanes bound, which one
    unconverged lane pins.  A re-flag is ONE vector broadcast per round
    (~the cost of the round's original flag pass), and its slab test
    uses each lane's OWN tightened bound — the per-lane reductions the
    tile-exit provably cannot reach.  Front-to-back min-extraction order
    makes the first opens exactly the ones that tighten bounds most, so
    one early re-cull kills clusters that would otherwise be opened for
    lanes that are already settled.  Correctness is containment: a
    cluster whose box misses every lane's [tmin, best_t] interval cannot
    hold a strictly closer hit (winners need tm < best_t), so culls are
    radiometrically invisible — equality-tested against the
    reflag-off loop (TestInstReflag).  The resident tier applies the
    same re-cull (pallas_trace.closest_hit_tile), sharing this knob.

    MEASURED: a net loss at every swept N on bigmesh (the knob's
    docstring home, pallas_trace._reflag_at, carries the numbers), so
    it ships default-OFF — the third refutation of the converged-bound
    headroom, and the one that closes the question: per-open scalar,
    whole-tile scalar, and per-round vector re-culls ALL cost more than
    the late opens they cancel."""
    from spt_tpu.ops.pallas_trace import _reflag_at as _impl

    return _impl()


def _rounds_ok(inst_refs) -> bool:
    """Per-LANE rounds traversal applies whenever there is more than one
    instance (at I=1 rounds is the union scheme with extra bookkeeping).
    Simulated on the production bigmesh bounce-1 ray set
    (tools/bigmesh_sim.py): rounds opens 8,827 clusters where the
    per-instance union scheme opens 19,741 (and its converged-bound limit
    is 5,325 vs 14,025) — per-lane visit sets are tiny (median 1 instance
    crossed) and the tile-union over 14 of 16 instances was the waste.

    Round 5 extended the scheme to heterogeneous BLAS tables (the
    reference's actual IAS shape, OptixBackend.cpp:1185-1308): each round
    serializes on ONE mesh id (the minimum among the lanes' next-crossed
    instances), so only lanes whose candidate uses that mesh trace this
    round and the block test keeps its shared-triangle-block property.
    Per-lane front-to-back order is unaffected (each lane's own cursor
    only advances on its own rounds); a tile mixing M' meshes pays ~M'x
    the round count, and the post-sort tiles that dominate are mesh-pure.
    Single-mesh scenes compile the exact round-4 body (the per-round mesh
    extraction is statically elided at M == 1)."""
    inst_lo = inst_refs[4]
    return _rounds_on() and inst_lo.shape[0] > 1


def _next_inst(inst_lo, inst_hi, icount, o, invw, tmin, bound,
               last_tn, last_id):
    """Per-lane nearest unconsumed instance, front-to-back.

    Each lane walks its crossed instances in (tnear, id) lexicographic
    order; (last_tn, last_id) is the per-lane cursor (strictly advanced
    every round, so each instance is visited at most once per lane).
    `bound` is the per-LANE upper bound (min of tmax and the lane's best
    hit) — a lane whose bound has shrunk past an instance's entry skips it
    outright, the per-lane analog of the union scheme's _box_flag1 recheck
    (which only fires when EVERY lane's bound cleared the box).  Returns
    (cur_tn, cur_id) with cur_id = -1 where no instance remains."""
    s, l = bound.shape

    def body(i, st):
        cur_tn, cur_id = st
        t0x = (inst_lo[i, 0] - o.x) * invw[0]
        t1x = (inst_hi[i, 0] - o.x) * invw[0]
        t0y = (inst_lo[i, 1] - o.y) * invw[1]
        t1y = (inst_hi[i, 1] - o.y) * invw[1]
        t0z = (inst_lo[i, 2] - o.z) * invw[2]
        t1z = (inst_hi[i, 2] - o.z) * invw[2]
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bound),
        )
        # candidate: box interval alive AND strictly after the cursor
        ok = ((tnear <= tfar)
              & ((tnear > last_tn) | ((tnear == last_tn) & (i > last_id))))
        upd = ok & ((tnear < cur_tn) | ((tnear == cur_tn) & (i < cur_id)))
        return (jnp.where(upd, tnear, cur_tn), jnp.where(upd, i, cur_id))

    big_id = jnp.full((s, l), 0x7FFFFFFF, jnp.int32)
    cur_tn, cur_id = jax.lax.fori_loop(
        0, icount, body, (jnp.full((s, l), _BIG_T), big_id))
    return cur_tn, jnp.where(cur_tn < _BIG_T, cur_id, -1)


_BIG_T = np.float32(1e30)


def _lane_planes(inst_tab, icount, cur_id, with_mesh: bool = False):
    """Per-lane instance row columns (r[9], t[3], [mesh,] mat_ov, sg) via
    masked scalar accumulate — the machine's cheap per-lane 'gather' for a
    tiny table (I scalar-broadcast selects per column; no dynamic_gather,
    whose ~8 us/address-plane cost refuted per-lane TRIANGLE fetch,
    docs/DESIGN.md).  Lanes with cur_id = -1 accumulate nothing and keep
    zeros — their transformed direction is 0, which every downstream test
    rejects (slab via bound, Moller-Trumbore via |a| <= eps).  The mesh
    column (12) is fetched only for multi-mesh rounds (with_mesh) so the
    single-mesh kernel body is unchanged."""
    shape = cur_id.shape
    cols = list(range(12)) + ([12] if with_mesh else []) + [13, 14]

    def body(i, acc):
        m = cur_id == i
        return tuple(jnp.where(m, inst_tab[i, c], a)
                     for c, a in zip(cols, acc))

    init = tuple(jnp.zeros(shape, jnp.float32) for _ in cols)
    return jax.lax.fori_loop(0, icount, body, init)


def _lane_xform(planes, o: Vec3, d: Vec3, active):
    """Per-lane world->object: like _xform_rays but with (S, L) coefficient
    planes; inactive lanes get direction 0 (rejected everywhere)."""
    r = planes
    zero = jnp.zeros_like(o.x)
    oo = Vec3(
        r[0] * o.x + r[1] * o.y + r[2] * o.z + r[9],
        r[3] * o.x + r[4] * o.y + r[5] * o.z + r[10],
        r[6] * o.x + r[7] * o.y + r[8] * o.z + r[11],
    )
    dd = Vec3(
        jnp.where(active, r[0] * d.x + r[1] * d.y + r[2] * d.z, zero),
        jnp.where(active, r[3] * d.x + r[4] * d.y + r[5] * d.z, zero),
        jnp.where(active, r[6] * d.x + r[7] * d.y + r[8] * d.z, zero),
    )
    return oo, dd


def _lane_finish(planes):
    """Winner-resolution hook with PER-LANE transform planes: instance
    material override + normal back to world via sign(det) * R_ofw^T —
    the vector-plane form of _make_finish (each lane's winner came from
    its OWN instance this round).  mat_ov/sg sit at the tuple tail so the
    multi-mesh planes (with the mesh column at [12]) index the same.
    Vertex normals skip the sign(det) factor — see _make_finish."""
    r, mat_ov, sg = planes[:12], planes[-2], planes[-1]
    mat_ov_i = mat_ov.astype(jnp.int32)

    def finish(mat, nx, ny, nz, geom=None):
        s = sg if geom is None else jnp.where(geom, sg, jnp.float32(1.0))
        return (
            jnp.where(mat_ov_i >= 0, mat_ov_i, mat),
            s * (r[0] * nx + r[3] * ny + r[6] * nz),
            s * (r[1] * nx + r[4] * ny + r[7] * nz),
            s * (r[2] * nx + r[5] * ny + r[8] * nz),
        )

    return finish


def inst_closest_tile_rounds(inst_refs, k, n_sph, tmin,
                             sph_c, sph_r, sph_m, o, d, tmax,
                             with_uv: bool = False):
    """Per-LANE instanced closest hit: every round each lane is rewritten
    into the object space of ITS OWN next-crossed instance (front-to-back)
    and one shared-BLAS cluster pass serves all lanes at once.

    The union scheme (inst_closest_tile below) opens, per flagged
    instance, the cluster-union of the WHOLE tile; with incoherent bounce
    rays a condensed tile unions 14 of 16 instances while the median lane
    crosses 1 (measured, tools/bigmesh_sim.py), so most opens test rays
    that never touched the instance.  Here the per-round cluster flags are
    the union of per-lane flags in each lane's own frame — 2.2x fewer
    opens flag-time, and the per-lane bound gives exact per-lane
    front-to-back termination (converged-limit 3.7x) where the union
    recheck needs every lane to agree.  The BLAS is SHARED (single mesh),
    so the block test needs no per-lane triangle gather — only the 14
    transform coefficients are per-lane, built by masked scalar
    accumulate.  Hit t stays world t (directions unnormalized), so one
    carry folds across rounds; normals return per-lane via _lane_finish.

    Heterogeneous BLAS tables (the reference's IAS shape,
    OptixBackend.cpp:1185-1308) serialize each round on ONE mesh id —
    the minimum among candidate lanes — so the shared-block property
    holds within the round and only that mesh's lanes advance their
    cursors (statically elided at M == 1; see _rounds_ok).  The
    reference's per-thread IAS->GAS descent (OptixBackend.cpp:916-1034)
    gets the same per-ray independence from hardware."""
    (blas_lo, blas_hi, tri_pack, blas_okey,
     inst_lo, inst_hi, inst_okey, inst_tab) = inst_refs
    s, l = o.x.shape
    icount = inst_lo.shape[0]
    m_count, cmax = blas_lo.shape[0], blas_lo.shape[1]
    multi = m_count > 1

    carry0, rinv = _sphere_pass_closest(
        n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax
    )
    if with_uv:
        zero_sl = jnp.zeros(o.x.shape, jnp.float32)
        carry0 = carry0 + (zero_sl, zero_sl)

    from spt_tpu.ops.pallas_trace import _inv_dir

    invw = (_inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z))
    tmax3 = tmax.reshape(1, s, l)
    neg = jnp.full((s, l), -_BIG_T)

    cur_tn0, cur_id0 = _next_inst(
        inst_lo, inst_hi, icount, o, invw, tmin,
        jnp.minimum(tmax, carry0[0]), neg,
        jnp.full((s, l), -1, jnp.int32))

    def cond(st):
        return jnp.any(st[1] >= 0)

    def body(st):
        cur_tn, cur_id, carry = st[0], st[1], st[2:]
        has_cand = cur_id >= 0
        planes = _lane_planes(inst_tab, icount, cur_id, with_mesh=multi)
        if multi:
            # this round's BLAS: the minimum mesh id among candidate
            # lanes — only those lanes trace now, the rest hold their
            # cursor (see _rounds_ok; per-lane order is unaffected)
            mesh_l = planes[12].astype(jnp.int32)
            mesh_r = jnp.min(jnp.where(has_cand, mesh_l,
                                       jnp.int32(0x7FFF)))
            active = has_cand & (mesh_l == mesh_r)
        else:
            mesh_r = 0
            active = has_cand
        oo, dd = _lane_xform(planes, o, d, active)
        oo3, dd3, iinv3 = _ray_planes(oo, dd, s, l)
        oct_ = _octant(dd)
        bound = jnp.where(active, jnp.minimum(tmax, carry[0]),
                          -_BIG_T).reshape(1, s, l)
        cflags = _box_flags(blas_lo[mesh_r], blas_hi[mesh_r],
                            oo3, iinv3, tmin, bound)
        okey_row = oct_ * m_count + mesh_r if multi else oct_
        ccount, ckey0 = _visit_keys(cflags, blas_okey, okey_row)
        open_cluster = make_cluster_opener(
            k, s, l, oo3, dd3, tmin, tmax3, with_uv,
            finish=_lane_finish(planes),
            with_ns=tri_pack.shape[-1] > 24,
        )

        if _recheck_on():

            def open_cl(_, kc):
                ckey, cr = kc[0], kc[1:]
                mm = jnp.min(ckey)
                cid = mm & _OKEY_ID_MASK
                # re-slab against the bound tightened by this round's
                # earlier opens (per-LANE, so converged lanes drop out
                # individually — see _recheck_on).  The six bounds are
                # dynamic SCALAR reads straight off the (M, CMAX, 3) refs
                # — blas_lo[m][cid, k] loads the plane into vregs first
                # and the dynamic index on the VALUE is a dynamic_slice
                # Mosaic cannot lower (same trap as the _box_flags B=1
                # variant, pallas_trace._box_flag1 docstring)
                bnow = jnp.where(active, jnp.minimum(tmax, cr[0]),
                                 -_BIG_T).reshape(1, s, l)
                t0x = (blas_lo[mesh_r, cid, 0] - oo3[0]) * iinv3[0]
                t1x = (blas_hi[mesh_r, cid, 0] - oo3[0]) * iinv3[0]
                t0y = (blas_lo[mesh_r, cid, 1] - oo3[1]) * iinv3[1]
                t1y = (blas_hi[mesh_r, cid, 1] - oo3[1]) * iinv3[1]
                t0z = (blas_lo[mesh_r, cid, 2] - oo3[2]) * iinv3[2]
                t1z = (blas_hi[mesh_r, cid, 2] - oo3[2]) * iinv3[2]
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tmin),
                )
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bnow),
                )
                alive = jnp.any(tnear <= tfar)
                cr = jax.lax.cond(
                    alive,
                    lambda c: open_cluster(tri_pack[base + cid], c),
                    lambda c: c, cr)
                return (jnp.where(ckey == mm, _OKEY_MISS, ckey),) + cr

        else:

            def open_cl(_, kc):
                ckey, cr = kc[0], kc[1:]
                mm = jnp.min(ckey)
                cr = open_cluster(tri_pack[base + (mm & _OKEY_ID_MASK)], cr)
                return (jnp.where(ckey == mm, _OKEY_MISS, ckey),) + cr

        base = mesh_r * cmax if multi else 0
        reflag_n = 0 if _recheck_on() else _reflag_at()
        if reflag_n > 0:
            # min-terminated variant of the loop above (the re-cull kills
            # keys, so the static ccount trip count no longer applies);
            # the next min rides the carry so the cond stays scalar.
            def rcond(kc):
                return kc[0] != _OKEY_MISS

            def rbody(kc):
                mm, ckey, it = kc[0], kc[1], kc[2]
                cr = kc[3:]
                cr = open_cluster(tri_pack[base + (mm & _OKEY_ID_MASK)], cr)
                ckey = jnp.where(ckey == mm, _OKEY_MISS, ckey)

                def reflag(ck):
                    bnow = jnp.where(active, jnp.minimum(tmax, cr[0]),
                                     -_BIG_T).reshape(1, s, l)
                    cf = _box_flags(blas_lo[mesh_r], blas_hi[mesh_r],
                                    oo3, iinv3, tmin, bnow)
                    return jnp.where(cf, ck, _OKEY_MISS)

                ckey = jax.lax.cond(it == reflag_n, reflag,
                                    lambda ck: ck, ckey)
                return (jnp.min(ckey), ckey, it + 1) + cr

            carry = jax.lax.while_loop(
                rcond, rbody,
                (jnp.min(ckey0), ckey0, jnp.int32(1)) + carry)[3:]
        else:
            carry = jax.lax.fori_loop(0, ccount, open_cl,
                                      (ckey0,) + carry)[1:]
        nxt_tn, nxt_id = _next_inst(
            inst_lo, inst_hi, icount, o, invw, tmin,
            jnp.minimum(tmax, carry[0]), cur_tn, cur_id)
        if multi:
            # only this round's mesh advanced; the rest hold their cursor
            nxt_tn = jnp.where(active, nxt_tn, cur_tn)
            nxt_id = jnp.where(active, nxt_id, cur_id)
        return (nxt_tn, nxt_id) + carry

    out_carry = jax.lax.while_loop(cond, body,
                                   (cur_tn0, cur_id0) + carry0)[2:]
    return closest_epilogue(out_carry, o, d, rinv, with_uv)


def inst_any_tile_rounds(inst_refs, k, n_sph, tmin,
                         sph_c, sph_r, sph_m, o, d, tmax):
    """Per-lane rounds occlusion (see inst_closest_tile_rounds): a blocked
    lane leaves the extraction immediately (bound -1), so rounds shrink to
    the unresolved lanes; same contract as inst_any_tile."""
    (blas_lo, blas_hi, tri_pack, blas_okey,
     inst_lo, inst_hi, inst_okey, inst_tab) = inst_refs
    s, l = o.x.shape
    icount = inst_lo.shape[0]
    m_count, cmax = blas_lo.shape[0], blas_lo.shape[1]
    multi = m_count > 1

    blocked0 = _sphere_pass_any(n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax)
    blocked0 = blocked0 | (tmax <= tmin).astype(jnp.int32)

    def traced(blocked0):
        from spt_tpu.ops.pallas_trace import _inv_dir

        invw = (_inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z))
        tmax3 = tmax.reshape(1, s, l)
        neg = jnp.full((s, l), -_BIG_T)

        def live_bound(blocked):
            return jnp.where(blocked != 0, jnp.float32(-1.0), tmax)

        cur_tn0, cur_id0 = _next_inst(
            inst_lo, inst_hi, icount, o, invw, tmin,
            live_bound(blocked0), neg, jnp.full((s, l), -1, jnp.int32))

        def cond(st):
            return jnp.any(st[1] >= 0)

        def body(st):
            cur_tn, cur_id, blocked = st
            has_cand = cur_id >= 0
            planes = _lane_planes(inst_tab, icount, cur_id,
                                  with_mesh=multi)
            if multi:
                mesh_l = planes[12].astype(jnp.int32)
                mesh_r = jnp.min(jnp.where(has_cand, mesh_l,
                                           jnp.int32(0x7FFF)))
                active = has_cand & (blocked == 0) & (mesh_l == mesh_r)
            else:
                mesh_r = 0
                active = has_cand & (blocked == 0)
            oo, dd = _lane_xform(planes, o, d, active)
            oo3, dd3, iinv3 = _ray_planes(oo, dd, s, l)
            oct_ = _octant(dd)
            lb = jnp.where(active, tmax, -_BIG_T).reshape(1, s, l)
            cflags = _box_flags(blas_lo[mesh_r], blas_hi[mesh_r],
                                oo3, iinv3, tmin, lb)
            okey_row = oct_ * m_count + mesh_r if multi else oct_
            ccount, ckey0 = _visit_keys(cflags, blas_okey, okey_row)
            base = mesh_r * cmax if multi else 0
            reflag_n = 0 if _recheck_on() else _reflag_at()

            if reflag_n > 0:
                # re-cull the remaining visit list once newly-BLOCKED
                # lanes have dropped out of the union (see _reflag_at:
                # the tile-wide all-blocked exit below fires only at
                # saturation; the re-flag prunes per-lane before it)
                def ccond(cc):
                    mm, _, blocked, _ = cc
                    return (mm != _OKEY_MISS) & ~jnp.all(blocked != 0)

                def cbody(cc):
                    mm, ckey, blocked, ii = cc
                    blk = tri_pack[base + (mm & _OKEY_ID_MASK)]
                    blocked = tri_block_any(blk, k, oo3, dd3, tmin,
                                            tmax3, blocked)
                    ckey = jnp.where(ckey == mm, _OKEY_MISS, ckey)

                    def reflag(ck):
                        lb2 = jnp.where(active & (blocked == 0), tmax,
                                        -_BIG_T).reshape(1, s, l)
                        cf = _box_flags(blas_lo[mesh_r], blas_hi[mesh_r],
                                        oo3, iinv3, tmin, lb2)
                        return jnp.where(cf, ck, _OKEY_MISS)

                    ckey = jax.lax.cond(ii == reflag_n, reflag,
                                        lambda ck: ck, ckey)
                    return jnp.min(ckey), ckey, blocked, ii + 1

                _, _, blocked, _ = jax.lax.while_loop(
                    ccond, cbody,
                    (jnp.min(ckey0), ckey0, blocked, jnp.int32(1)))
            else:
                def ccond(cc):
                    ii, _, blocked = cc
                    return (ii < ccount) & ~jnp.all(blocked != 0)

                def cbody(cc):
                    ii, ckey, blocked = cc
                    mm = jnp.min(ckey)
                    blk = tri_pack[base + (mm & _OKEY_ID_MASK)]
                    return (ii + 1,
                            jnp.where(ckey == mm, _OKEY_MISS, ckey),
                            tri_block_any(blk, k, oo3, dd3, tmin, tmax3,
                                          blocked))

                _, _, blocked = jax.lax.while_loop(
                    ccond, cbody, (jnp.int32(0), ckey0, blocked))
            nxt_tn, nxt_id = _next_inst(
                inst_lo, inst_hi, icount, o, invw, tmin,
                live_bound(blocked), cur_tn, cur_id)
            if multi:
                nxt_tn = jnp.where(active, nxt_tn, cur_tn)
                nxt_id = jnp.where(active, nxt_id, cur_id)
            return nxt_tn, nxt_id, blocked

        return jax.lax.while_loop(cond, body,
                                  (cur_tn0, cur_id0, blocked0))[2]

    return jax.lax.cond(jnp.all(blocked0 != 0), lambda b: b,
                        traced, blocked0)


def inst_closest_tile(inst_refs, k, n_sph, tmin,
                      sph_c, sph_r, sph_m, o, d, tmax,
                      with_uv: bool = False, bounce=None):
    """Full instanced closest-hit for one (S, L) ray tile inside a Pallas
    kernel: sphere pass + TLAS cull + per-opened-instance object-space
    cluster traversal.

    Multi-instance scenes route to the per-lane rounds traversal
    (inst_closest_tile_rounds — since round 5 including heterogeneous
    BLAS tables via per-round mesh serialization; SPT_INST_ROUNDS=0
    re-routes here for the A/B); the per-instance union scheme below
    stays the I=1 path and the measured baseline.

    `inst_refs` = (blas_lo (M, CMAX, 3), blas_hi, tri_pack (M*CMAX, K, 24),
    blas_okey (8*M, CMAX, 1) — row octant*M + mesh, one dynamic leading
    index — inst_lo (I, 3), inst_hi, inst_okey (8, I, 1), inst_tab
    (I, 16)) VMEM refs.  Same value-plane contract as
    pallas_trace.closest_hit_tile; reused by the standalone kernels AND the
    fused bounce/frame kernels (ops/pallas_bounce).

    `bounce` (optional traced scalar): when given on a rounds-eligible
    scene, bounce 0 routes through the union scheme at RUNTIME (lax.cond)
    — the hybrid: camera tiles cross 1-2 instances coherently, so the
    tile-union ~equals the per-lane need and the union scheme skips the
    rounds bookkeeping (round-4 measurement: rounds cost bounce0 ~2.5
    ms/frame on bigmesh vs union, docs/DESIGN.md); incoherent bounces
    >= 1 keep rounds.  SPT_INST_HYBRID=0 disables."""
    if _rounds_ok(inst_refs):
        def rounds(_):
            return inst_closest_tile_rounds(inst_refs, k, n_sph, tmin,
                                            sph_c, sph_r, sph_m, o, d,
                                            tmax, with_uv=with_uv)

        if bounce is not None and _hybrid_on():
            def union(_):
                return inst_closest_tile_union(inst_refs, k, n_sph, tmin,
                                               sph_c, sph_r, sph_m, o, d,
                                               tmax, with_uv=with_uv)

            return jax.lax.cond(jnp.asarray(bounce) == 0, union, rounds, 0)
        return rounds(0)
    return inst_closest_tile_union(inst_refs, k, n_sph, tmin,
                                   sph_c, sph_r, sph_m, o, d, tmax,
                                   with_uv=with_uv)


def inst_closest_tile_union(inst_refs, k, n_sph, tmin,
                            sph_c, sph_r, sph_m, o, d, tmax,
                            with_uv: bool = False):
    """The per-instance union scheme (see inst_closest_tile)."""
    (blas_lo, blas_hi, tri_pack, blas_okey,
     inst_lo, inst_hi, inst_okey, inst_tab) = inst_refs
    s, l = o.x.shape
    cmax = blas_lo.shape[1]
    woct = _octant(d)

    carry0, rinv = _sphere_pass_closest(
        n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax
    )
    if with_uv:
        zero_sl = jnp.zeros(o.x.shape, jnp.float32)
        carry0 = carry0 + (zero_sl, zero_sl)

    o3, d3, inv3 = _ray_planes(o, d, s, l)
    bound0 = jnp.minimum(tmax, carry0[0]).reshape(1, s, l)
    iflags = _box_flags(inst_lo, inst_hi, o3, inv3, tmin, bound0)
    icount, ikey0 = _visit_keys(iflags, inst_okey, woct)
    tmax3 = tmax.reshape(1, s, l)

    def open_inst(j, key_and_carry):
        ikey, carry = key_and_carry[0], key_and_carry[1:]
        m = jnp.min(ikey)
        i = m & _OKEY_ID_MASK
        # Re-check this instance's world box against the bound tightened by
        # the instances already opened (front-to-back order makes later
        # instances frequently occluded by the time their turn comes — one
        # box test skips a whole BLAS pass; the supercluster recheck win,
        # ops/pallas_stream.open_super).
        bound = jnp.minimum(tmax, carry[0]).reshape(1, s, l)
        ialive = _box_flag1(inst_lo, inst_hi, i, o3, inv3, tmin, bound)

        def live(carry):
            r, mesh, mat_ov, sg = _read_inst(inst_tab, i)
            oo, dd = _xform_rays(r, o, d)
            oo3, dd3, iinv3 = _ray_planes(oo, dd, s, l)
            ooct = _octant(dd)
            cflags = _box_flags(blas_lo[mesh], blas_hi[mesh],
                                oo3, iinv3, tmin, bound)
            m_count = blas_lo.shape[0]
            ckey0 = jnp.where(cflags, blas_okey[ooct * m_count + mesh],
                              _OKEY_MISS)
            ccount = jnp.sum(cflags.astype(jnp.int32))
            base = mesh * cmax
            open_cluster = make_cluster_opener(
                k, s, l, oo3, dd3, tmin, tmax3, with_uv,
                finish=_make_finish(r, mat_ov, sg),
                with_ns=tri_pack.shape[-1] > 24,
            )

            def open_cl(_, kc):
                ckey, cr = kc[0], kc[1:]
                mm = jnp.min(ckey)
                cr = open_cluster(tri_pack[base + (mm & _OKEY_ID_MASK)], cr)
                return (jnp.where(ckey == mm, _OKEY_MISS, ckey),) + cr

            return jax.lax.fori_loop(0, ccount, open_cl,
                                     (ckey0,) + carry)[1:]

        carry = jax.lax.cond(ialive, live, lambda c: c, carry)
        return (jnp.where(ikey == m, _OKEY_MISS, ikey),) + carry

    out_carry = jax.lax.fori_loop(0, icount, open_inst,
                                  (ikey0,) + carry0)[1:]
    return closest_epilogue(out_carry, o, d, rinv, with_uv)


def inst_any_tile(inst_refs, k, n_sph, tmin,
                  sph_c, sph_r, sph_m, o, d, tmax, bounce=None):
    """Instanced occlusion for one (S, L) ray tile; returns (S, L) int32
    blocked flags.  Same empty-interval-reports-blocked contract as
    pallas_trace.any_hit_tile, same early exits as pallas_stream's
    streaming variant (whole-subtile skip, saturation exit, settled lanes
    leaving the box tests).  Multi-instance scenes route to the per-lane
    rounds variant (see inst_closest_tile).

    `bounce` (optional traced scalar): bounce-0 shadow rays go to the
    union scheme at runtime — they all point at ONE light from 1-2
    coherently-crossed instances, so the global front-to-back instance
    order the union scheme exploits matches every lane and rounds
    bookkeeping is pure overhead (the hybrid of inst_closest_tile,
    applied to the ~8 ms/frame shadow share DESIGN.md measured)."""
    if _rounds_ok(inst_refs):
        def rounds(_):
            return inst_any_tile_rounds(inst_refs, k, n_sph, tmin,
                                        sph_c, sph_r, sph_m, o, d, tmax)

        if bounce is not None and _hybrid_on():
            def union(_):
                return inst_any_tile_union(inst_refs, k, n_sph, tmin,
                                           sph_c, sph_r, sph_m, o, d, tmax)

            return jax.lax.cond(jnp.asarray(bounce) == 0, union, rounds, 0)
        return rounds(0)
    return inst_any_tile_union(inst_refs, k, n_sph, tmin,
                               sph_c, sph_r, sph_m, o, d, tmax)


def inst_any_tile_union(inst_refs, k, n_sph, tmin,
                        sph_c, sph_r, sph_m, o, d, tmax):
    """The per-instance union occlusion scheme (see inst_any_tile)."""
    (blas_lo, blas_hi, tri_pack, blas_okey,
     inst_lo, inst_hi, inst_okey, inst_tab) = inst_refs
    s, l = o.x.shape
    cmax = blas_lo.shape[1]
    woct = _octant(d)

    blocked0 = _sphere_pass_any(n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax)
    blocked0 = blocked0 | (tmax <= tmin).astype(jnp.int32)

    def traced(blocked0):
        o3, d3, inv3 = _ray_planes(o, d, s, l)
        bound = tmax.reshape(1, s, l)

        def live_bound(blocked):
            return jnp.where(blocked.reshape(1, s, l) != 0,
                             jnp.float32(-1.0), bound)

        iflags = _box_flags(inst_lo, inst_hi, o3, inv3, tmin,
                            live_bound(blocked0))
        icount, ikey0 = _visit_keys(iflags, inst_okey, woct)

        def icond(carry):
            j, _, blocked = carry
            return (j < icount) & ~jnp.all(blocked != 0)

        def ibody(carry):
            j, ikey, blocked = carry
            m = jnp.min(ikey)
            i = m & _OKEY_ID_MASK
            lb = live_bound(blocked)
            ialive = _box_flag1(inst_lo, inst_hi, i, o3, inv3, tmin, lb)

            def live(blocked):
                r, mesh, _, _ = _read_inst(inst_tab, i)
                oo, dd = _xform_rays(r, o, d)
                oo3, dd3, iinv3 = _ray_planes(oo, dd, s, l)
                ooct = _octant(dd)
                cflags = _box_flags(blas_lo[mesh], blas_hi[mesh],
                                    oo3, iinv3, tmin, lb)
                m_count = blas_lo.shape[0]
                ckey0 = jnp.where(cflags, blas_okey[ooct * m_count + mesh],
                                  _OKEY_MISS)
                ccount = jnp.sum(cflags.astype(jnp.int32))
                base = mesh * cmax

                def ccond(cc):
                    ii, _, blocked = cc
                    return (ii < ccount) & ~jnp.all(blocked != 0)

                def cbody(cc):
                    ii, ckey, blocked = cc
                    mm = jnp.min(ckey)
                    blk = tri_pack[base + (mm & _OKEY_ID_MASK)]
                    return (ii + 1,
                            jnp.where(ckey == mm, _OKEY_MISS, ckey),
                            tri_block_any(blk, k, oo3, dd3, tmin, bound,
                                          blocked))

                _, _, blocked = jax.lax.while_loop(
                    ccond, cbody, (jnp.int32(0), ckey0, blocked))
                return blocked

            blocked = jax.lax.cond(ialive, live, lambda b: b, blocked)
            return j + 1, jnp.where(ikey == m, _OKEY_MISS, ikey), blocked

        _, _, blocked = jax.lax.while_loop(
            icond, ibody, (jnp.int32(0), ikey0, blocked0))
        return blocked

    return jax.lax.cond(jnp.all(blocked0 != 0), lambda b: b,
                        traced, blocked0)


def _inst_closest_kernel(k, n_sph, tmin, with_uv,
                         ox, oy, oz, dx, dy, dz, tmaxr,
                         blas_lo, blas_hi, tri_pack, blas_okey,
                         inst_lo, inst_hi, inst_okey, inst_tab,
                         sph_c, sph_r, sph_m,
                         *outs):
    res = inst_closest_tile(
        (blas_lo, blas_hi, tri_pack, blas_okey,
         inst_lo, inst_hi, inst_okey, inst_tab),
        k, n_sph, tmin, sph_c, sph_r, sph_m,
        Vec3(ox[:], oy[:], oz[:]), Vec3(dx[:], dy[:], dz[:]), tmaxr[:],
        with_uv=with_uv,
    )
    for ref, v in zip(outs, res):
        ref[:] = v


def _inst_any_kernel(k, n_sph, tmin,
                     ox, oy, oz, dx, dy, dz, tmaxr,
                     blas_lo, blas_hi, tri_pack, blas_okey,
                     inst_lo, inst_hi, inst_okey, inst_tab,
                     sph_c, sph_r, sph_m,
                     out_blocked):
    out_blocked[:] = inst_any_tile(
        (blas_lo, blas_hi, tri_pack, blas_okey,
         inst_lo, inst_hi, inst_okey, inst_tab),
        k, n_sph, tmin, sph_c, sph_r, sph_m,
        Vec3(ox[:], oy[:], oz[:]), Vec3(dx[:], dy[:], dz[:]), tmaxr[:],
    )


def _inst_call(kernel, ia, scene, o: Vec3, d: Vec3, tmin, tmax,
               out_shapes, extra_statics=()):
    n = o.x.shape[0]
    rows = n // LANES
    shape2 = (rows, LANES)
    tile_rows = _divisor(rows)

    def r2(a):
        return a.reshape(shape2)

    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    state = [r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z),
             r2(tmax_arr)]
    tables = [ia.blas_lo, ia.blas_hi, ia.tri_pack, ia.blas_okey,
              ia.inst_lo, ia.inst_hi, ia.inst_okey, ia.inst,
              scene.sph_center, scene.sph_radius.reshape(-1, 1),
              scene.sph_mat.reshape(-1, 1)]

    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(a):
        return pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        kernel, ia.cluster_size, scene.num_spheres, np.float32(tmin),
        *extra_statics
    )
    outs = pl.pallas_call(
        kern,
        grid=(rows // tile_rows,),
        in_specs=[block] * 7 + [table_spec(a) for a in tables],
        out_specs=[block] * len(out_shapes),
        out_shape=[jax.ShapeDtypeStruct(shape2, dt) for dt in out_shapes],
    )(*state, *tables)
    return outs, n


def closest_hit(ia, scene, o: Vec3, d: Vec3, tmin=0.0,
                tmax=np.float32(np.inf)):
    """Instanced closest hit -> isect.HitV.  Same contract as
    pallas_trace.closest_hit; `ia` is the scene's InstAccel."""
    tmax = (np.float32(min(float(tmax), 1e30))
            if isinstance(tmax, (int, float)) else tmax)
    with_uv = scene.textures is not None
    f32, i32 = jnp.float32, jnp.int32
    out_shapes = ([f32, f32, f32, f32, i32, i32]
                  + ([f32, f32] if with_uv else []))
    outs, n = _inst_call(
        _inst_closest_kernel, ia, scene, o, d, tmin, tmax,
        out_shapes=out_shapes, extra_statics=(with_uv,),
    )
    outs = [x.reshape(n) for x in outs]
    t, nx, ny, nz, mat, kind = outs[:6]
    t = jnp.where(kind != isect.KIND_MISS, t, jnp.float32(jnp.inf))
    return isect.HitV(t=t, normal=Vec3(nx, ny, nz), mat_id=mat, kind=kind,
                      uvx=outs[6] if with_uv else None,
                      uvy=outs[7] if with_uv else None)


def any_hit(ia, scene, o: Vec3, d: Vec3, tmin=0.0,
            tmax=np.float32(np.inf)):
    """Instanced occlusion -> (N,) bool.  Same contract (including the
    empty-interval-reports-blocked note) as pallas_trace.any_hit."""
    tmax = (np.float32(min(float(tmax), 1e30))
            if isinstance(tmax, (int, float)) else tmax)
    outs, n = _inst_call(
        _inst_any_kernel, ia, scene, o, d, tmin, tmax,
        out_shapes=[jnp.int32],
    )
    return outs[0].reshape(n) != 0
