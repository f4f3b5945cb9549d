"""Alternative BLAS clusterings, scored offline on the production ray sets.

The cluster build (ops/bvh.build_mesh_accel) cuts the Morton-sorted soup
into fixed 64-triangle clusters.  A raw Morton cut crosses thin features
(the rattan chair is woven rods), producing long snake-shaped clusters with
fat overlapping AABBs; every fat box inflates the per-tile flag union that
sets the open count — the dominant frame cost at every mesh scale
(docs/DESIGN.md "Where the ... frame's time goes").

This tool re-clusters the SAME triangles with candidate schemes and counts
block-test opens over the REAL bounce ray sets (tools/bigmesh_stats.prepare,
cached to .npz after the first TPU pass), under both the rounds traversal
(bigmesh) and the resident-tier tile union (chair):

  morton       the shipped build (baseline)
  median       recursive longest-axis object-median split, cut points
               rounded to cluster_size multiples (exactly the same table
               shapes as the shipped build — drop-in via an `order` change)
  sah          like median, but the split point on the sorted axis is the
               argmin of the binned surface-area cost (leaf-count weighted)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/cluster_sim.py
(TPU only for the first run's hit passes; rays cached to /tmp after that.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LANES = 1024
TMIN = 1e-4
CACHE = "/tmp/spt_cluster_sim_rays.npz"


def slab(lo, hi, o, inv, bound):
    t0 = (lo[:, None] - o[None]) * inv[None]
    t1 = (hi[:, None] - o[None]) * inv[None]
    tnear = np.maximum(np.minimum(t0, t1).max(-1), TMIN)
    tfar = np.minimum(np.maximum(t0, t1).min(-1), bound[None])
    return tnear <= tfar, tnear


def inv_of(d):
    return np.where(np.abs(d) > 1e-20, 1.0 / d,
                    np.where(d >= 0, 1e30, -1e30)).astype(np.float32)


# ---------------------------------------------------------------------------
# clustering schemes: all return a permutation of [0, n) such that
# consecutive `cs`-sized groups become the clusters


def order_morton(lo, hi, cs):
    from spt_tpu.ops.bvh import _morton3

    centroid = 0.5 * (lo + hi)
    slo, shi = centroid.min(0), centroid.max(0)
    norm = (centroid - slo) / np.maximum(shi - slo, 1e-12)
    return np.argsort(_morton3(norm), kind="stable")


def _split_rec(idx, centroid, cs, out, pick_cut):
    if len(idx) <= cs:
        out.append(idx)
        return
    c = centroid[idx]
    ax = int((c.max(0) - c.min(0)).argmax())
    part = idx[np.argsort(c[:, ax], kind="stable")]
    cut = pick_cut(centroid[part], ax, len(idx), cs)
    _split_rec(part[:cut], centroid, cs, out, pick_cut)
    _split_rec(part[cut:], centroid, cs, out, pick_cut)


def _median_cut(_c, _ax, n, cs):
    h = int(round(n / (2 * cs))) * cs
    return min(max(cs, h), (n - 1) // cs * cs)


def _sah_cut(c, ax, n, cs):
    """argmin over cluster_size-aligned cuts of
    SA(left)*ceil(nl/cs) + SA(right)*ceil(nr/cs) on the sorted axis."""
    cuts = np.arange(cs, n, cs)
    if not len(cuts):
        return n
    # prefix/suffix AABB surface areas of the sorted centroids (cheap proxy
    # for triangle AABBs; the sim re-scores with true boxes afterwards)
    pre_lo = np.minimum.accumulate(c, 0)
    pre_hi = np.maximum.accumulate(c, 0)
    suf_lo = np.minimum.accumulate(c[::-1], 0)[::-1]
    suf_hi = np.maximum.accumulate(c[::-1], 0)[::-1]

    def sa(lo, hi):
        e = np.maximum(hi - lo, 0)
        return e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]

    nl = cuts.astype(np.float64)
    nr = n - nl
    cost = (sa(pre_lo[cuts - 1], pre_hi[cuts - 1]) * np.ceil(nl / cs)
            + sa(suf_lo[cuts], suf_hi[cuts]) * np.ceil(nr / cs))
    return int(cuts[cost.argmin()])


def order_split(lo, hi, cs, pick_cut):
    centroid = 0.5 * (lo + hi)
    out = []
    _split_rec(np.arange(len(centroid)), centroid, cs, out, pick_cut)
    return np.concatenate(out)


def cluster_boxes(lo, hi, order, cs):
    n = len(order)
    pad = (-n) % cs
    los = np.concatenate([lo[order], np.full((pad, 3), np.inf)])
    his = np.concatenate([hi[order], np.full((pad, 3), -np.inf)])
    c = len(los) // cs
    clo = los.reshape(c, cs, 3).min(1)
    chi = his.reshape(c, cs, 3).max(1)
    return clo.astype(np.float32), chi.astype(np.float32)


def box_stats(clo, chi):
    e = np.maximum(chi - clo, 0)
    sa = (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]) * 2
    return sa.sum()


# ---------------------------------------------------------------------------


def rounds_opens(inst_lo, inst_hi, R, T, clo, chi, o, d, bound):
    """Opens under the per-LANE rounds traversal (single shared BLAS)."""
    opens = 0
    for s in range(0, len(o), LANES):
        sl = slice(s, s + LANES)
        ot, dt, bt = o[sl], d[sl], bound[sl]
        it = inv_of(dt)
        f, tn = slab(inst_lo, inst_hi, ot, it, bt)        # (I, N)
        order = np.argsort(np.where(f, tn, np.inf), axis=0)
        counts = f.sum(0)
        # per (instance, lane) object-space cluster flags
        lane_flags = np.zeros((len(R), len(ot), len(clo)), bool)
        for i in range(len(R)):
            lanes = np.nonzero(f[i])[0]
            if not len(lanes):
                continue
            oo = ot[lanes] @ R[i].T + T[i]
            dd = dt[lanes] @ R[i].T
            cf, _ = slab(clo, chi, oo, inv_of(dd), bt[lanes])
            lane_flags[i, lanes] = cf.T
        for r in range(int(counts.max()) if len(counts) else 0):
            active = counts > r
            if not active.any():
                break
            inst_r = order[r]
            u = np.zeros(len(clo), bool)
            for lane in np.nonzero(active)[0]:
                u |= lane_flags[inst_r[lane], lane]
            opens += int(u.sum())
    return opens


def tile_opens(clo, chi, o, d, bound):
    """Opens under the resident-tier tile union (chair-style, no TLAS)."""
    opens = 0
    for s in range(0, len(o), LANES):
        sl = slice(s, s + LANES)
        f, _ = slab(clo, chi, o[sl], inv_of(d[sl]), bound[sl])
        opens += int(f.any(-1).sum())
    return opens


def load_rays():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return {k: z[k] for k in z.files}
    from bigmesh_stats import prepare

    scene, o0, d0, o1, d1, t1 = prepare()
    ia = scene.inst
    tab = np.asarray(ia.inst)
    data = dict(
        o0=o0, d0=d0, o1=o1, d1=d1, t1=t1,
        inst_lo=np.asarray(ia.inst_lo), inst_hi=np.asarray(ia.inst_hi),
        R=tab[:, :9].reshape(-1, 3, 3), T=tab[:, 9:12],
    )
    # the shared BLAS mesh's raw triangle AABBs (object space, real tris
    # only), for re-clustering
    from benchmarks.stream_ab import build_chair_grid

    desc, _, _ = build_chair_grid()
    mesh = desc.meshes[0]
    pos = mesh.positions
    idx = mesh.indices.astype(np.int64)
    v0 = pos[idx[:, 0]].astype(np.float32)
    v1 = pos[idx[:, 1]].astype(np.float32)
    v2 = pos[idx[:, 2]].astype(np.float32)
    data["tri_lo"] = np.minimum(np.minimum(v0, v1), v2)
    data["tri_hi"] = np.maximum(np.maximum(v0, v1), v2)
    np.savez(CACHE, **data)
    return data


def main():
    cs = 64
    z = load_rays()
    tri_lo, tri_hi = z["tri_lo"], z["tri_hi"]
    inf1 = np.full(len(z["o1"]), np.inf, np.float32)
    inf0 = np.full(len(z["o0"]), np.inf, np.float32)
    oracle = np.where(np.isfinite(z["t1"]), z["t1"] * 1.001,
                      np.inf).astype(np.float32)

    schemes = {
        "morton": order_morton(tri_lo, tri_hi, cs),
        "median": order_split(tri_lo, tri_hi, cs, _median_cut),
        "sah": order_split(tri_lo, tri_hi, cs, _sah_cut),
    }
    for name, order in schemes.items():
        clo, chi = cluster_boxes(tri_lo, tri_hi, order, cs)
        print(f"== {name}: {len(clo)} clusters, "
              f"total box SA {box_stats(clo, chi):.1f} ==", flush=True)
        o0 = rounds_opens(z["inst_lo"], z["inst_hi"], z["R"], z["T"],
                          clo, chi, z["o0"], z["d0"], inf0)
        print(f"  bounce0 rounds opens: {o0}", flush=True)
        o1 = rounds_opens(z["inst_lo"], z["inst_hi"], z["R"], z["T"],
                          clo, chi, z["o1"], z["d1"], inf1)
        o1c = rounds_opens(z["inst_lo"], z["inst_hi"], z["R"], z["T"],
                           clo, chi, z["o1"], z["d1"], oracle)
        print(f"  bounce1 rounds opens: {o1} (converged-bound {o1c})",
              flush=True)


if __name__ == "__main__":
    main()
