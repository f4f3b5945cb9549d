"""Cluster-size (K) sweep for the bigmesh rounds traversal, offline.

The chair-scale K sweep (docs/DESIGN.md) re-confirmed K=64 on a
HIT-dominated coherent workload.  The bigmesh bounce-1 field is
MISS-dominated (66 % of live scatter rays exit the scene) and the rounds
traversal changed what an open costs relative to a flag, so the optimum
may shift: smaller clusters = tighter boxes = fewer false flags per miss
ray, at more opens of cheaper blocks.

Cost model per open, from the measured decomposition at K=64
(tools/bench_trace_parts: extraction+read 0.30 us, sub-blocked M-T math
1.4 * K/64 us — the math is VMEM-traffic-bound and linear in K):

    per_open(K) = 0.30 + 1.40 * K / 64   [us]

Bounce-1 rays are cached from tools/bigmesh_stats.prepare (one TPU run,
then pure numpy).  Run: python tools/bigmesh_ksweep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = "/tmp/bigmesh_rays.npz"


def cached_rays():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["o0"], z["d0"], z["o1"], z["d1"], z["t1"]
    from bigmesh_stats import prepare

    _, o0, d0, o1, d1, t1 = prepare()
    np.savez(CACHE, o0=o0, d0=d0, o1=o1, d1=d1, t1=t1)
    return o0, d0, o1, d1, t1


def main():
    from bigmesh_sim import Geo, sim_rounds

    from benchmarks.stream_ab import build_chair_grid
    from spt_tpu.scene.flatten import flatten_scene

    o0, d0, o1, d1, t1 = cached_rays()
    desc, _, _ = build_chair_grid()
    inf1 = np.full(len(o1), np.inf, np.float32)
    inf0 = np.full(len(o0), np.inf, np.float32)
    oracle = np.where(np.isfinite(t1), t1 * 1.001, np.inf).astype(np.float32)

    for k in (64, 32, 16):
        scene = flatten_scene(desc, cluster_size=k)
        g = Geo(scene.inst)
        us = 0.30 + 1.40 * k / 64
        print(f"K={k} (cmax {g.cmax}, per-open model {us:.2f} us):")
        for o, d, b, lbl in ((o0, d0, inf0, "bounce0/inf"),
                             (o1, d1, inf1, "bounce1/inf"),
                             (o1, d1, oracle, "bounce1/oracle")):
            opens = sim_rounds(g, o, d, b, lbl)
            print(f"    -> {lbl}: {opens * us / 1e3:.1f} ms at "
                  f"{us:.2f} us/open")


if __name__ == "__main__":
    main()
