"""Candidate bigmesh traversal schemes, simulated in numpy on the REAL
bounce-1 ray distribution (tools/bigmesh_stats.prepare builds it: cosine
scatter from the true primary hits, production-sorted, condensed).

Context (measured 08-19): the instanced tier renders the 4x4 chair grid at
142.6 ms/frame and the stage sweep puts ~126 ms in bounces 1-3.  The open
model says a condensed bounce-1 tile unions 14.4 of 16 instances and opens
658 clusters (chair bounce-1 tiles open ~73).  Before touching kernels,
this tool scores every candidate fix by its modeled open count:

  current    per opened instance, cluster-union over the whole tile
             (what ops/pallas_inst ships).  Bound models: inf (flag-time)
             and oracle (per-lane true closest t — the CONVERGED limit of
             the front-to-back shrinking-bound recheck).
  pairs      TLAS at (instance x supercluster) granularity: 16 supers of
             6 clusters each get world AABBs per instance; a flagged pair
             opens only its own <=SUPER_FAN clusters.  Models tighter
             mid-level culling.
  rounds     per-LANE object space: each round every live lane is
             transformed by ITS OWN next-crossed instance (per-lane
             transform = 16-way masked scalar accumulate, ~vreg cheap;
             the BLAS is SHARED so the block test needs no per-lane
             triangle gather).  Opens per round = tile union of per-lane
             flags in their own frames.
  keys       re-sorts of the bounce-1 set under alternative keys, scored
             under the current scheme (does a better key fix the union?).

Per-open hardware cost: ~1.26 us (docs/DESIGN.md, chair-calibrated).

Run: python tools/bigmesh_sim.py        (TPU only for the two hit passes)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigmesh_stats import LANES, inv_of, prepare  # noqa: E402

OPEN_US = 1.26
TMIN = 1e-4


def slab(lo, hi, o, inv, bound):
    """(B, N) hit-interval flags + tnear.  lo/hi (B, 3); o/inv (N, 3);
    bound (N,)."""
    t0 = (lo[:, None] - o[None]) * inv[None]
    t1 = (hi[:, None] - o[None]) * inv[None]
    tnear = np.maximum(np.minimum(t0, t1).max(-1), TMIN)
    tfar = np.minimum(np.maximum(t0, t1).min(-1), bound[None])
    return tnear <= tfar, tnear


class Geo:
    """Instance tables in simulation-friendly form."""

    def __init__(self, ia):
        self.inst_lo = np.asarray(ia.inst_lo)
        self.inst_hi = np.asarray(ia.inst_hi)
        tab = np.asarray(ia.inst)
        self.R = tab[:, :9].reshape(-1, 3, 3)      # object_from_world
        self.T = tab[:, 9:12]
        self.mesh = tab[:, 12].astype(int)
        self.blas_lo = np.asarray(ia.blas_lo)      # (M, C, 3)
        self.blas_hi = np.asarray(ia.blas_hi)
        self.n_inst = len(tab)
        self.cmax = self.blas_lo.shape[1]
        # world AABBs of each (instance, super) pair from the object super
        # box corners through world_from_object (only when cmax tiles into
        # SUPER_FAN groups — the InstAccel BLAS doesn't pad to the fan the
        # way the stream accel does; sim_pairs is a refuted scheme anyway)
        from spt_tpu.ops.bvh import SUPER_FAN
        self.fan = SUPER_FAN
        if self.cmax % self.fan:
            self.pair_lo = self.pair_hi = None
            return
        self.n_sup = self.cmax // self.fan
        pair_lo = np.empty((self.n_inst, self.n_sup, 3), np.float32)
        pair_hi = np.empty((self.n_inst, self.n_sup, 3), np.float32)
        for i in range(self.n_inst):
            Rw = np.linalg.inv(self.R[i])
            Tw = -Rw @ self.T[i]
            m = self.mesh[i]
            slo = self.blas_lo[m].reshape(self.n_sup, self.fan, 3)
            shi = self.blas_hi[m].reshape(self.n_sup, self.fan, 3)
            # padding clusters ship inverted boxes; keep them inverted
            good = (slo <= shi).all(-1)
            glo = np.where(good[..., None], slo, np.inf).min(1)
            ghi = np.where(good[..., None], shi, -np.inf).max(1)
            for s in range(self.n_sup):
                if not np.isfinite(glo[s]).all():
                    pair_lo[i, s], pair_hi[i, s] = 1, -1   # inverted: empty
                    continue
                corners = np.array([[glo[s][k] if b & (1 << k) else ghi[s][k]
                                     for k in range(3)]
                                    for b in range(8)], np.float32)
                w = corners @ Rw.T + Tw
                pair_lo[i, s], pair_hi[i, s] = w.min(0), w.max(0)
        self.pair_lo, self.pair_hi = pair_lo, pair_hi

    def obj_rays(self, i, o, d):
        oo = o @ self.R[i].T + self.T[i]
        dd = d @ self.R[i].T
        return oo, dd, inv_of(dd)


def tile_iter(o, d, bound):
    for s in range(0, len(o), LANES):
        sl = slice(s, s + LANES)
        yield o[sl], d[sl], bound[sl]


def sim_current(g, o, d, bound, label):
    opens = insts = 0
    inv = inv_of(d)
    for ot, dt, bt in tile_iter(o, d, bound):
        it = inv_of(dt)
        f, _ = slab(g.inst_lo, g.inst_hi, ot, it, bt)
        flagged = f.any(-1)
        insts += flagged.sum()
        for i in np.nonzero(flagged)[0]:
            oo, dd, iv = g.obj_rays(i, ot, dt)
            cf, _ = slab(g.blas_lo[g.mesh[i]], g.blas_hi[g.mesh[i]],
                         oo, iv, bt)
            opens += int(cf.any(-1).sum())
    n_tiles = len(o) // LANES
    print(f"  current/{label:>7}: {opens} opens ({opens / n_tiles:.0f}/tile),"
          f" {insts} inst passes -> {opens * OPEN_US / 1e3:.1f} ms model")
    return opens


def sim_pairs(g, o, d, bound, label):
    opens = pairs = 0
    plo = g.pair_lo.reshape(-1, 3)
    phi = g.pair_hi.reshape(-1, 3)
    for ot, dt, bt in tile_iter(o, d, bound):
        it = inv_of(dt)
        f, _ = slab(plo, phi, ot, it, bt)
        flagged = f.any(-1).reshape(g.n_inst, g.n_sup)
        pairs += flagged.sum()
        for i in np.nonzero(flagged.any(-1))[0]:
            oo, dd, iv = g.obj_rays(i, ot, dt)
            m = g.mesh[i]
            for s in np.nonzero(flagged[i])[0]:
                sl = slice(s * g.fan, (s + 1) * g.fan)
                cf, _ = slab(g.blas_lo[m][sl], g.blas_hi[m][sl], oo, iv, bt)
                opens += int(cf.any(-1).sum())
    n_tiles = len(o) // LANES
    print(f"  pairs  /{label:>7}: {opens} opens ({opens / n_tiles:.0f}/tile),"
          f" {pairs} pair passes -> {opens * OPEN_US / 1e3:.1f} ms model")
    return opens


def sim_rounds(g, o, d, bound, label):
    """Per-lane object-space rounds; per-lane front-to-back instance order
    with the bound applied per lane."""
    opens = rounds_total = 0
    for ot, dt, bt in tile_iter(o, d, bound):
        it = inv_of(dt)
        f, tn = slab(g.inst_lo, g.inst_hi, ot, it, bt)     # (I, N)
        order = np.argsort(np.where(f, tn, np.inf), axis=0)  # near-to-far
        counts = f.sum(0)                                   # crossings/lane
        max_r = int(counts.max())
        rounds_total += max_r
        # per (lane, instance) object-space cluster flags
        lane_flags = np.zeros((g.n_inst, LANES, g.cmax), bool)
        for i in range(g.n_inst):
            lanes = np.nonzero(f[i])[0]
            if not len(lanes):
                continue
            oo, dd, iv = g.obj_rays(i, ot[lanes], dt[lanes])
            cf, _ = slab(g.blas_lo[g.mesh[i]], g.blas_hi[g.mesh[i]],
                         oo, iv, bt[lanes])
            lane_flags[i, lanes] = cf.T
        for r in range(max_r):
            active = counts > r
            if not active.any():
                break
            inst_r = order[r]                               # (N,)
            u = np.zeros(g.cmax, bool)
            for lane in np.nonzero(active)[0]:
                u |= lane_flags[inst_r[lane], lane]
            opens += int(u.sum())
    n_tiles = len(o) // LANES
    print(f"  rounds /{label:>7}: {opens} opens ({opens / n_tiles:.0f}/tile),"
          f" {rounds_total} rounds -> {opens * OPEN_US / 1e3:.1f} ms model")
    return opens


def sim_rounds_exit(g, o, d, bound, oracle):
    """UPPER BOUND on a whole-tile early exit added to the shipped rounds
    kernel: order each round's flagged clusters by tile-min tnear (per-lane
    tnear in the lane's own object frame) and terminate the open loop once
    every remaining cluster's entry lies beyond EVERY active lane's bound.

    Modeled optimistically — each lane's bound starts at its CONVERGED
    value min(oracle closest t, its current instance's box exit tfar) —
    so the printed count is the BEST the exit could ever do; the real
    kernel's bounds only reach that after the winning opens have run.
    Compare against rounds/inf (shipped flag-time) and rounds/oracle (the
    per-open recheck's converged limit, measured a NET LOSS at 51.9 vs
    49.8 ms because it pays 6 scalar slab reads + lax.cond per open; the
    exit costs one comparison per iteration instead)."""
    opens_ship = opens_exit = 0
    for t_i, (ot, dt, bt) in enumerate(tile_iter(o, d, bound)):
        it = inv_of(dt)
        n = len(ot)
        orc = oracle[t_i * LANES:t_i * LANES + n]
        f, tn = slab(g.inst_lo, g.inst_hi, ot, it, bt)
        # instance exit t per (I, lane)
        t0 = (g.inst_lo[:, None] - ot[None]) * it[None]
        t1 = (g.inst_hi[:, None] - ot[None]) * it[None]
        tf = np.minimum(np.maximum(t0, t1).min(-1), bt[None])
        order = np.argsort(np.where(f, tn, np.inf), axis=0)
        counts = f.sum(0)
        lane_cf = np.zeros((g.n_inst, n, g.cmax), bool)
        lane_tn = np.full((g.n_inst, n, g.cmax), np.inf, np.float32)
        for i in range(g.n_inst):
            lanes = np.nonzero(f[i])[0]
            if not len(lanes):
                continue
            oo, dd, iv = g.obj_rays(i, ot[lanes], dt[lanes])
            cf, ctn = slab(g.blas_lo[g.mesh[i]], g.blas_hi[g.mesh[i]],
                           oo, iv, bt[lanes])
            lane_cf[i, lanes] = cf.T
            lane_tn[i, lanes] = np.where(cf, ctn, np.inf).T
        for r in range(int(counts.max()) if n else 0):
            active = np.nonzero(counts > r)[0]
            if not len(active):
                break
            inst_r = order[r]
            fl = lane_cf[inst_r[active], active]          # (A, cmax)
            tl = lane_tn[inst_r[active], active]
            u = fl.any(0)
            opens_ship += int(u.sum())
            tile_tn = tl.min(0)                           # min over lanes
            elane = np.minimum(orc[active], tf[inst_r[active], active])
            emax = elane[np.isfinite(elane)].max() if np.isfinite(
                elane).any() else -np.inf
            opens_exit += int((u & (tile_tn <= emax)).sum())
    n_tiles = len(o) // LANES
    print(f"  rounds /exit-UB: {opens_exit} opens "
          f"({opens_exit / n_tiles:.0f}/tile) vs shipped {opens_ship} -> "
          f"{opens_exit * OPEN_US / 1e3:.1f} vs "
          f"{opens_ship * OPEN_US / 1e3:.1f} ms model (optimistic bound)")
    return opens_exit


def first_inst_key(g, o, d):
    """Entry-instance id (first crossed front-to-back; n_inst = none)."""
    inv = inv_of(d)
    f, tn = slab(g.inst_lo, g.inst_hi, o, inv,
                 np.full(len(o), np.inf, np.float32))
    tn = np.where(f, tn, np.inf)
    first = tn.argmin(0)
    return np.where(f.any(0), first, g.n_inst).astype(np.uint32)


def morton30(o, lo, inv_ext):
    q = np.clip((o - lo) * inv_ext, 0.0, 1.0)
    q = (q * 1023.0).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def main():
    scene, o0, d0, o1, d1, t1 = prepare()
    g = Geo(scene.inst)
    inf = np.full(len(o1), np.inf, np.float32)
    oracle = np.where(np.isfinite(t1), t1 * 1.001, np.inf).astype(np.float32)

    # per-lane stats
    inv1 = inv_of(d1)
    f, _ = slab(g.inst_lo, g.inst_hi, o1, inv1, inf)
    c = f.sum(0)
    print(f"bounce1 per-lane instance crossings: mean {c.mean():.2f} "
          f"median {np.median(c):.0f} p90 {np.percentile(c, 90):.0f} "
          f"max {c.max()}")

    print("== bounce1, production sort ==")
    for bound, lbl in ((inf, "inf"), (oracle, "oracle")):
        sim_current(g, o1, d1, bound, lbl)
        sim_pairs(g, o1, d1, bound, lbl)
        sim_rounds(g, o1, d1, bound, lbl)
    sim_rounds_exit(g, o1, d1, inf, oracle)

    # alternative sort keys, scored with the oracle bound under each scheme
    a = scene.accel
    lo = np.asarray(a.cluster_lo).min(0)
    inv_ext = 1.0 / np.maximum(np.asarray(a.cluster_hi).max(0) - lo, 1e-9)
    octant = ((d1[:, 0] < 0) * 4 + (d1[:, 1] < 0) * 2
              + (d1[:, 2] < 0)).astype(np.uint32)
    m30 = morton30(o1, lo, inv_ext)
    fik = first_inst_key(g, o1, d1)
    keys = {
        "oct|morton (prod)": (octant.astype(np.uint64) << 30) | m30,
        "inst|oct|morton": ((fik.astype(np.uint64) << 33)
                            | (octant.astype(np.uint64) << 30) | m30),
        "oct|inst|morton": ((octant.astype(np.uint64) << 35)
                            | (fik.astype(np.uint64) << 30) | (m30 >> 5)),
        "oct|dirfine|morton": ((octant.astype(np.uint64) << 36)
                               | ((np.abs(d1).argmax(1).astype(np.uint64))
                                  << 34) | m30),
    }
    print("== bounce1, alternative sort keys (oracle bound) ==")
    for name, k in keys.items():
        idx = np.argsort(k, kind="stable")
        print(f" key = {name}")
        sim_current(g, o1[idx], d1[idx], oracle[idx], "oracle")
        sim_pairs(g, o1[idx], d1[idx], oracle[idx], "oracle")
        sim_rounds(g, o1[idx], d1[idx], oracle[idx], "oracle")


if __name__ == "__main__":
    main()
