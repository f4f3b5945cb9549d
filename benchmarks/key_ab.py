"""A/B the ray-sort key layout (SPT_SORT_KEY) on the big-mesh scene.

The chair measured octant-major as the best key (docs/DESIGN.md); the 4x4
chair grid is the scene the position-major layouts were built for — the
coarse morton bits separate the chairs, so a sorted tile's lanes should
target ONE chair's supercluster range instead of mixing all 16.  One
subprocess per key (the key is baked in at trace time); the measurement
protocol lives in benchmarks/_harness.py.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/key_ab.py [keys...]
Env: SPT_RES (default 512x384), SPT_CHAIN (default 8), SPT_SCENE
(bigmesh|chair), SPT_KEYAB_STAGES (default 2).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _harness import run_child

KEYS = sys.argv[1:] or ["octant", "hybrid", "morton"]


def main():
    stages = os.environ.get("SPT_KEYAB_STAGES", "2")
    for key in KEYS:
        ms, err = run_child({"SPT_SORT_KEY": key,
                             "SPT_CHILD_SORT_STAGES": stages})
        if ms is None:
            print(f"{key:>8}: FAILED\n{err}")
        else:
            print(f"{key:>8}: {ms:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
