"""Per-stage device cost of the sorted STREAM-mode mesh frame (4x4 chair
grid, ~98k triangles — the fused pipeline past MAX_ACCEL_TRIS).

Same method as stage_times.py: sweep SPT_SORT_ABLATE (the trace-truncation
hook in wavefront._fused_mesh_sorted_frame) one subprocess per stage;
prefix deltas = per-stage cost; 'full' re-checks the untruncated frame.
The measurement protocol lives in benchmarks/_harness.py.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bigmesh_stages.py
Env: SPT_RES=512x384, SPT_CHAIN=8, plus every experiment knob the child
inherits (SPT_STAGES, SPT_CONDENSE, SPT_TRACE_SUBK, SPT_INSTANCED, ...).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _harness import run_child

STAGES = ["bounce0", "sort1", "condense", "bounce1", "sort2", "frame",
          "uncondense", ""]


def main():
    prev = None
    for stage in STAGES:
        overrides = {"SPT_SORT_ABLATE": stage} if stage else {}
        if not stage:
            os.environ.pop("SPT_SORT_ABLATE", None)
        ms, err = run_child(overrides, timeout=1200)
        name = stage or "full"
        if ms is None:
            print(f"{name:>10}: FAILED\n{err}")
            continue
        delta = "" if prev is None else f"  (+{ms - prev:.2f})"
        print(f"{name:>10}: {ms:7.2f} ms{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
