"""HBM-streaming two-level trace kernels: reference-scale meshes on TPU.

The VMEM tracer (ops/pallas_trace) keeps the whole packed triangle table
resident — ~6 MB at 12k triangles, busting VMEM near ~25k.  The reference's
backends make scene size a non-issue (rtcCommitScene over any mesh,
EmbreeBackend.cpp:181; GAS builds sized by input, OptixBackend.cpp:916-1034).
This module is the TPU answer for that scale: `tri_pack` stays in HBM and
clusters stream through a VMEM scratch block on demand, gated by a second
accel level.

Per (S, 128) ray subtile:

1. slab-test the SUPERCLUSTER AABBs (bvh.MeshAccel.sup_lo/hi: one box per
   SUPER_FAN consecutive Morton-ordered clusters) in one (G, S, 128)
   broadcast — G is C/SUPER_FAN, so this pass costs 1/SUPER_FAN of the flat
   cluster pass;
2. min-extract opened supers front-to-back (bvh.MeshAccel.sup_okey packed
   rank<<16|id keys, per ray-direction octant);
3. per opened super: ONE async DMA of its (SUPER_FAN, K, 128) triangle
   block HBM -> VMEM scratch (K=64: 512 KiB, ~0.6 us of HBM bandwidth;
   Mosaic DMA slices must be 128-aligned on the last dim, hence
   bvh.MeshAccel.tri_stream, the zero-padded copy of tri_pack), then the
   usual cluster-level flags + min-extraction + Moller-Trumbore block tests
   against the scratch-resident block (the opener shared with
   pallas_trace.make_cluster_opener), with the closest-hit bound tightened
   between supers.

VMEM cost is O(SUPER_FAN * K) regardless of scene size; HBM traffic tracks
the rays' working set, not the scene.  Same call contracts as
pallas_trace.closest_hit / any_hit; ops/intersect routes here when the
packed table is too large to sit in VMEM.
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
from spt_tpu.ops.bvh import SUPER_FAN
from spt_tpu.ops.pallas_trace import (
    LANES,
    _BIG,
    _OKEY_ID_MASK,
    _OKEY_MISS,
    _box_flag1,
    _box_flags,
    _divisor,
    _inv_dir,
    _sphere_pass_any,
    _sphere_pass_closest,
    tri_block_any,
    _visit_keys,
    closest_epilogue,
    make_cluster_opener,
)


def _ray_planes(o, d, s, l):
    ix, iy, iz = _inv_dir(d.x), _inv_dir(d.y), _inv_dir(d.z)
    o3 = (o.x.reshape(1, s, l), o.y.reshape(1, s, l), o.z.reshape(1, s, l))
    d3 = (d.x.reshape(1, s, l), d.y.reshape(1, s, l), d.z.reshape(1, s, l))
    inv3 = (ix.reshape(1, s, l), iy.reshape(1, s, l), iz.reshape(1, s, l))
    return o3, d3, inv3


def _octant(d):
    return ((jnp.sum(d.x) < 0).astype(jnp.int32) * 4
            + (jnp.sum(d.y) < 0).astype(jnp.int32) * 2
            + (jnp.sum(d.z) < 0).astype(jnp.int32))


def _recheck_on() -> bool:
    """Trace-time knob for the per-super shrinking-bound recheck (the
    cluster-level version was a measured loss on the chair —
    pallas_trace._box_flags docstring — but one box test per SUPER buys a
    whole DMA + 16-cluster pass when it fires; SPT_SUPER_RECHECK=0
    re-runs that A/B)."""
    import os

    return os.environ.get("SPT_SUPER_RECHECK", "1") != "0"


def _db_on() -> bool:
    """Trace-time knob for double-buffered supercluster DMA: while super
    j's 16-cluster pass runs against one VMEM buffer, super j+1's block
    streams into the other, hiding the HBM->VMEM latency the
    single-buffer loop pays between every pair of supers (it waits right
    after the cluster flags — a few us of box tests — so most of the
    copy is exposed).  Costs one extra (SUPER_FAN, K, 128) VMEM block
    (512 KiB at K=64).  SPT_STREAM_DB=0 reverts to the single-buffer
    loop for A/B."""
    import os

    return os.environ.get("SPT_STREAM_DB", "1") != "0"


def stream_closest_tile(stream_refs, k, n_sph, tmin,
                        sph_c, sph_r, sph_m, o, d, tmax,
                        scratch, sem, with_uv: bool = False,
                        with_ns: bool = False, scratch2=None, sem2=None):
    """Full streaming closest-hit for one (S, L) ray tile inside a Pallas
    kernel: sphere pass + supercluster cull + per-opened-super DMA +
    cluster-level min-extraction loop.

    `stream_refs` = (cl_lo, cl_hi, cl_okey, sup_lo, sup_hi, sup_okey,
    tri_hbm) where tri_hbm is the 128-padded (C, K, 128) triangle table in
    ANY/HBM space; `scratch` is a (SUPER_FAN, K, 128) VMEM ref and `sem` a
    DMA semaphore.  Same value-plane contract as
    pallas_trace.closest_hit_tile — reused by the standalone stream kernels
    AND the fused bounce/frame kernels (ops/pallas_bounce), which is how
    reference-scale meshes keep the fused fast path
    (EmbreeBackend.cpp:181's any-size role)."""
    cl_lo, cl_hi, cl_okey, sup_lo, sup_hi, sup_okey, tri_hbm = stream_refs
    s, l = o.x.shape
    f = SUPER_FAN
    oct_ = _octant(d)

    carry0, rinv = _sphere_pass_closest(
        n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax
    )
    if with_uv:
        zero_sl = jnp.zeros(o.x.shape, jnp.float32)
        carry0 = carry0 + (zero_sl, zero_sl)

    o3, d3, inv3 = _ray_planes(o, d, s, l)
    bound0 = jnp.minimum(tmax, carry0[0]).reshape(1, s, l)
    sflags = _box_flags(sup_lo, sup_hi, o3, inv3, tmin, bound0)
    scount, skey0 = _visit_keys(sflags, sup_okey, oct_)

    # with_ns cannot be derived from the scratch block (always 128 wide);
    # the caller reads it off the accel's tri_pack width (bvh.PACK_NS)
    open_cluster = make_cluster_opener(k, s, l, o3, d3, tmin,
                                       tmax.reshape(1, s, l), with_uv,
                                       with_ns=with_ns)

    if scratch2 is not None and _db_on():
        # Double-buffered super loop: iteration j prefetches super j+1's
        # triangle block into the buffer it is NOT reading, so the copy
        # overlaps the full 16-cluster pass instead of just the cluster
        # flags.  The shrinking-bound recheck folds into the cluster cull
        # (a dead super zeroes its cluster visit list; its speculative DMA
        # is the price of the overlap).  Start/wait pairing is exact: the
        # prologue starts super 0 iff scount > 0, iteration j starts super
        # j+1 iff it exists, and iteration j+1 (which runs iff it does)
        # waits it — a full fori run leaves nothing in flight.
        def start_dma(g, scr, sm):
            pltpu.make_async_copy(tri_hbm.at[pl.ds(g * f, f)], scr,
                                  sm).start()

        def wait_dma(g, scr, sm):
            pltpu.make_async_copy(tri_hbm.at[pl.ds(g * f, f)], scr,
                                  sm).wait()

        m0 = jnp.min(skey0)
        g0 = jnp.where(m0 == _OKEY_MISS, jnp.int32(-1), m0 & _OKEY_ID_MASK)
        pl.when(g0 >= 0)(lambda: start_dma(g0, scratch, sem))
        skey1 = jnp.where(skey0 == m0, _OKEY_MISS, skey0)

        def open_super_db(j, state):
            skey, g, carry = state[0], state[1], state[2:]
            nm = jnp.min(skey)
            ng = jnp.where(nm == _OKEY_MISS, jnp.int32(-1),
                           nm & _OKEY_ID_MASK)

            def process(scr, sm, nxt_scr, nxt_sm, carry):
                pl.when(ng >= 0)(lambda: start_dma(ng, nxt_scr, nxt_sm))
                base = g * f
                bound = jnp.minimum(tmax, carry[0]).reshape(1, s, l)
                salive = _box_flag1(sup_lo, sup_hi, g, o3, inv3, tmin,
                                    bound)
                cflags = _box_flags(cl_lo[pl.ds(base, f)],
                                    cl_hi[pl.ds(base, f)],
                                    o3, inv3, tmin, bound) & salive
                ckey0 = jnp.where(cflags, cl_okey[oct_, pl.ds(base, f)],
                                  _OKEY_MISS)
                ccount = jnp.sum(cflags.astype(jnp.int32))
                wait_dma(g, scr, sm)

                def open_cl(i, kc):
                    ckey, cr = kc[0], kc[1:]
                    mm = jnp.min(ckey)
                    cr = open_cluster(scr[(mm & _OKEY_ID_MASK) - base], cr)
                    return (jnp.where(ckey == mm, _OKEY_MISS, ckey),) + cr

                return jax.lax.fori_loop(0, ccount, open_cl,
                                         (ckey0,) + carry)[1:]

            carry = jax.lax.cond(
                jax.lax.rem(j, 2) == 0,
                lambda c: process(scratch, sem, scratch2, sem2, c),
                lambda c: process(scratch2, sem2, scratch, sem, c),
                carry)
            return (jnp.where(skey == nm, _OKEY_MISS, skey), ng) + carry

        out_carry = jax.lax.fori_loop(0, scount, open_super_db,
                                      (skey1, g0) + carry0)[2:]
        return closest_epilogue(out_carry, o, d, rinv, with_uv)

    def open_super(j, key_and_carry):
        skey, carry = key_and_carry[0], key_and_carry[1:]
        m = jnp.min(skey)
        g = m & _OKEY_ID_MASK
        base = g * f
        # Re-check this super's box against the bound tightened by every
        # super already opened (the visit list was culled with the INITIAL
        # bound): front-to-back order makes later supers frequently dead by
        # the time their turn comes — a dead super skips its DMA and its
        # whole cluster pass for the cost of one box test.
        bound = jnp.minimum(tmax, carry[0]).reshape(1, s, l)
        salive = _box_flag1(sup_lo, sup_hi, g, o3, inv3, tmin, bound)

        def live(carry):
            cp = pltpu.make_async_copy(tri_hbm.at[pl.ds(base, f)], scratch,
                                       sem)
            cp.start()
            # Cluster-level cull inside the super, same tightened bound.
            cflags = _box_flags(cl_lo[pl.ds(base, f)], cl_hi[pl.ds(base, f)],
                                o3, inv3, tmin, bound)
            ckey0 = jnp.where(cflags, cl_okey[oct_, pl.ds(base, f)],
                              _OKEY_MISS)
            ccount = jnp.sum(cflags.astype(jnp.int32))
            cp.wait()

            def open_cl(i, kc):
                ckey, cr = kc[0], kc[1:]
                mm = jnp.min(ckey)
                cr = open_cluster(scratch[(mm & _OKEY_ID_MASK) - base], cr)
                return (jnp.where(ckey == mm, _OKEY_MISS, ckey),) + cr

            return jax.lax.fori_loop(0, ccount, open_cl, (ckey0,) + carry)[1:]

        if _recheck_on():
            carry = jax.lax.cond(salive, live, lambda c: c, carry)
        else:
            carry = live(carry)
        return (jnp.where(skey == m, _OKEY_MISS, skey),) + carry

    out_carry = jax.lax.fori_loop(0, scount, open_super,
                                  (skey0,) + carry0)[1:]
    return closest_epilogue(out_carry, o, d, rinv, with_uv)


def stream_any_tile(stream_refs, k, n_sph, tmin,
                    sph_c, sph_r, sph_m, o, d, tmax, scratch, sem,
                    scratch2=None, sem2=None):
    """Streaming occlusion for one (S, L) ray tile inside a Pallas kernel;
    returns (S, L) int32 blocked flags.  Same ref contract as
    stream_closest_tile; same empty-interval-reports-blocked contract as
    pallas_trace.any_hit_tile."""
    cl_lo, cl_hi, cl_okey, sup_lo, sup_hi, sup_okey, tri_hbm = stream_refs
    s, l = o.x.shape
    f = SUPER_FAN
    oct_ = _octant(d)

    blocked0 = _sphere_pass_any(n_sph, sph_c, sph_r, sph_m, o, d, tmin, tmax)
    # Empty-interval lanes count as blocked so the early exits can fire
    # (same contract as pallas_trace.any_hit).
    blocked0 = blocked0 | (tmax <= tmin).astype(jnp.int32)

    def traced_db(blocked0):
        # Double-buffered variant (see stream_closest_tile): the outer
        # while_loop can exit early once every lane is blocked, so the
        # in-flight prefetch is drained after the loop (tracked by the
        # carried next-super id; -1 = nothing outstanding).
        o3, d3, inv3 = _ray_planes(o, d, s, l)
        bound = tmax.reshape(1, s, l)

        def live_bound(blocked):
            return jnp.where(blocked.reshape(1, s, l) != 0,
                             jnp.float32(-1.0), bound)

        def start_dma(g, scr, sm):
            pltpu.make_async_copy(tri_hbm.at[pl.ds(g * f, f)], scr,
                                  sm).start()

        def wait_dma(g, scr, sm):
            pltpu.make_async_copy(tri_hbm.at[pl.ds(g * f, f)], scr,
                                  sm).wait()

        sflags = _box_flags(sup_lo, sup_hi, o3, inv3, tmin,
                            live_bound(blocked0))
        scount, skey0 = _visit_keys(sflags, sup_okey, oct_)

        m0 = jnp.min(skey0)
        g0 = jnp.where(m0 == _OKEY_MISS, jnp.int32(-1), m0 & _OKEY_ID_MASK)
        pl.when(g0 >= 0)(lambda: start_dma(g0, scratch, sem))
        skey1 = jnp.where(skey0 == m0, _OKEY_MISS, skey0)

        def scond(carry):
            j, _, _, blocked = carry
            return (j < scount) & ~jnp.all(blocked != 0)

        def sbody(carry):
            j, skey, g, blocked = carry
            nm = jnp.min(skey)
            ng = jnp.where(nm == _OKEY_MISS, jnp.int32(-1),
                           nm & _OKEY_ID_MASK)

            def process(scr, sm, nxt_scr, nxt_sm, blocked):
                pl.when(ng >= 0)(lambda: start_dma(ng, nxt_scr, nxt_sm))
                base = g * f
                lb = live_bound(blocked)
                salive = _box_flag1(sup_lo, sup_hi, g, o3, inv3, tmin, lb)
                cflags = _box_flags(cl_lo[pl.ds(base, f)],
                                    cl_hi[pl.ds(base, f)],
                                    o3, inv3, tmin, lb) & salive
                ckey0 = jnp.where(cflags, cl_okey[oct_, pl.ds(base, f)],
                                  _OKEY_MISS)
                ccount = jnp.sum(cflags.astype(jnp.int32))
                wait_dma(g, scr, sm)

                def ccond(cc):
                    i, _, blocked = cc
                    return (i < ccount) & ~jnp.all(blocked != 0)

                def cbody(cc):
                    i, ckey, blocked = cc
                    mm = jnp.min(ckey)
                    blk = scr[(mm & _OKEY_ID_MASK) - base]
                    return (i + 1,
                            jnp.where(ckey == mm, _OKEY_MISS, ckey),
                            tri_block_any(blk, k, o3, d3, tmin, bound,
                                          blocked))

                _, _, blocked = jax.lax.while_loop(
                    ccond, cbody, (jnp.int32(0), ckey0, blocked))
                return blocked

            blocked = jax.lax.cond(
                jax.lax.rem(j, 2) == 0,
                lambda b: process(scratch, sem, scratch2, sem2, b),
                lambda b: process(scratch2, sem2, scratch, sem, b),
                blocked)
            return (j + 1, jnp.where(skey == nm, _OKEY_MISS, skey), ng,
                    blocked)

        jf, _, gf, blocked = jax.lax.while_loop(
            scond, sbody, (jnp.int32(0), skey1, g0, blocked0))
        # Early exit leaves the prefetch for the never-run iteration jf in
        # buffer jf % 2; a completed run leaves gf = -1.
        pl.when(gf >= 0)(lambda: jax.lax.cond(
            jax.lax.rem(jf, 2) == 0,
            lambda: wait_dma(gf, scratch, sem),
            lambda: wait_dma(gf, scratch2, sem2)))
        return blocked

    def traced(blocked0):
        o3, d3, inv3 = _ray_planes(o, d, s, l)
        bound = tmax.reshape(1, s, l)

        def live_bound(blocked):
            # blocked lanes leave every box test: an empty [tmin, -1]
            # interval fails the slab overlap, so supers/clusters kept
            # alive only by already-settled lanes stop being visited as
            # the shadow pass saturates.
            return jnp.where(blocked.reshape(1, s, l) != 0,
                             jnp.float32(-1.0), bound)

        sflags = _box_flags(sup_lo, sup_hi, o3, inv3, tmin,
                            live_bound(blocked0))
        scount, skey0 = _visit_keys(sflags, sup_okey, oct_)

        def scond(carry):
            j, _, blocked = carry
            return (j < scount) & ~jnp.all(blocked != 0)

        def sbody(carry):
            j, skey, blocked = carry
            m = jnp.min(skey)
            g = m & _OKEY_ID_MASK
            base = g * f
            lb = live_bound(blocked)
            salive = _box_flag1(sup_lo, sup_hi, g, o3, inv3, tmin, lb)

            def live(blocked):
                cp = pltpu.make_async_copy(tri_hbm.at[pl.ds(base, f)],
                                           scratch, sem)
                cp.start()
                cflags = _box_flags(cl_lo[pl.ds(base, f)],
                                    cl_hi[pl.ds(base, f)],
                                    o3, inv3, tmin, lb)
                ckey0 = jnp.where(cflags, cl_okey[oct_, pl.ds(base, f)],
                                  _OKEY_MISS)
                ccount = jnp.sum(cflags.astype(jnp.int32))
                cp.wait()

                def ccond(cc):
                    i, _, blocked = cc
                    return (i < ccount) & ~jnp.all(blocked != 0)

                def cbody(cc):
                    i, ckey, blocked = cc
                    mm = jnp.min(ckey)
                    blk = scratch[(mm & _OKEY_ID_MASK) - base]
                    return (i + 1, jnp.where(ckey == mm, _OKEY_MISS, ckey),
                            tri_block_any(blk, k, o3, d3, tmin, bound,
                                          blocked))

                _, _, blocked = jax.lax.while_loop(
                    ccond, cbody, (jnp.int32(0), ckey0, blocked))
                return blocked

            if _recheck_on():
                blocked = jax.lax.cond(salive, live,
                                       lambda b: b, blocked)
            else:
                blocked = live(blocked)
            return j + 1, jnp.where(skey == m, _OKEY_MISS, skey), blocked

        _, _, blocked = jax.lax.while_loop(
            scond, sbody, (jnp.int32(0), skey0, blocked0))
        return blocked

    body = traced_db if (scratch2 is not None and _db_on()) else traced
    return jax.lax.cond(jnp.all(blocked0 != 0), lambda b: b,
                        body, blocked0)


def _stream_closest_kernel(k, n_sph, tmin, with_uv, with_ns, db,
                           ox, oy, oz, dx, dy, dz, tmaxr,
                           cl_lo, cl_hi, cl_okey,
                           sup_lo, sup_hi, sup_okey,
                           sph_c, sph_r, sph_m,
                           tri_hbm,
                           *outs_and_scratch):
    nscr = 4 if db else 2
    outs = outs_and_scratch[:-nscr]
    scratch, sem = outs_and_scratch[-nscr:][:2]
    scratch2, sem2 = outs_and_scratch[-2:] if db else (None, None)
    res = stream_closest_tile(
        (cl_lo, cl_hi, cl_okey, sup_lo, sup_hi, sup_okey, tri_hbm),
        k, n_sph, tmin, sph_c, sph_r, sph_m,
        Vec3(ox[:], oy[:], oz[:]), Vec3(dx[:], dy[:], dz[:]), tmaxr[:],
        scratch, sem, with_uv=with_uv, with_ns=with_ns,
        scratch2=scratch2, sem2=sem2,
    )
    for r, v in zip(outs, res):
        r[:] = v


def _stream_any_kernel(k, n_sph, tmin, db,
                       ox, oy, oz, dx, dy, dz, tmaxr,
                       cl_lo, cl_hi, cl_okey,
                       sup_lo, sup_hi, sup_okey,
                       sph_c, sph_r, sph_m,
                       tri_hbm,
                       out_blocked, *scratches):
    scratch, sem = scratches[:2]
    scratch2, sem2 = scratches[2:] if db else (None, None)
    out_blocked[:] = stream_any_tile(
        (cl_lo, cl_hi, cl_okey, sup_lo, sup_hi, sup_okey, tri_hbm),
        k, n_sph, tmin, sph_c, sph_r, sph_m,
        Vec3(ox[:], oy[:], oz[:]), Vec3(dx[:], dy[:], dz[:]), tmaxr[:],
        scratch, sem, scratch2=scratch2, sem2=sem2,
    )


def _stream_call(kernel, accel, scene, o: Vec3, d: Vec3, tmin, tmax,
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
    vmem_tables = [accel.cluster_lo, accel.cluster_hi, accel.cl_okey,
                   accel.sup_lo, accel.sup_hi, accel.sup_okey,
                   scene.sph_center, scene.sph_radius.reshape(-1, 1),
                   scene.sph_mat.reshape(-1, 1)]

    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(a):
        return pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
                            memory_space=pltpu.VMEM)

    k = accel.cluster_size
    db = _db_on()
    kern = functools.partial(
        kernel, k, scene.num_spheres, np.float32(tmin), *extra_statics, db
    )
    scratch_shapes = [
        pltpu.VMEM((SUPER_FAN, k, 128), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ] * (2 if db else 1)
    outs = pl.pallas_call(
        kern,
        grid=(rows // tile_rows,),
        in_specs=[block] * 7 + [table_spec(a) for a in vmem_tables]
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[block] * len(out_shapes),
        out_shape=[jax.ShapeDtypeStruct(shape2, dt) for dt in out_shapes],
        scratch_shapes=scratch_shapes,
    )(*state, *vmem_tables, accel.tri_stream)
    return outs, n


def closest_hit(accel, scene, o: Vec3, d: Vec3, tmin=0.0,
                tmax=np.float32(np.inf)):
    """Streaming cluster-culled closest hit -> isect.HitV.  Same contract
    as pallas_trace.closest_hit; tri_pack never enters VMEM whole."""
    tmax = (np.float32(min(float(tmax), 1e30))
            if isinstance(tmax, (int, float)) else tmax)
    with_uv = scene.textures is not None
    f32, i32 = jnp.float32, jnp.int32
    out_shapes = ([f32, f32, f32, f32, i32, i32]
                  + ([f32, f32] if with_uv else []))
    outs, n = _stream_call(
        _stream_closest_kernel, accel, scene, o, d, tmin, tmax,
        out_shapes=out_shapes,
        extra_statics=(with_uv, accel.tri_pack.shape[-1] > 24),
    )
    outs = [x.reshape(n) for x in outs]
    t, nx, ny, nz, mat, kind = outs[:6]
    t = jnp.where(kind != isect.KIND_MISS, t, jnp.float32(jnp.inf))
    return isect.HitV(t=t, normal=Vec3(nx, ny, nz), mat_id=mat, kind=kind,
                      uvx=outs[6] if with_uv else None,
                      uvy=outs[7] if with_uv else None)


def any_hit(accel, scene, o: Vec3, d: Vec3, tmin=0.0,
            tmax=np.float32(np.inf)):
    """Streaming cluster-culled occlusion -> (N,) bool.  Same contract
    (including the empty-interval-reports-blocked note) as
    pallas_trace.any_hit."""
    tmax = (np.float32(min(float(tmax), 1e30))
            if isinstance(tmax, (int, float)) else tmax)
    outs, n = _stream_call(
        _stream_any_kernel, accel, scene, o, d, tmin, tmax,
        out_shapes=[jnp.int32],
    )
    return outs[0].reshape(n) != 0
