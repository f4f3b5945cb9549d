"""Per-stage device cost of the sorted STREAM-mode mesh frame (4x4 chair
grid, ~98k triangles — the fused pipeline past MAX_ACCEL_TRIS).

Same method as stage_times.py: sweep SPT_SORT_ABLATE (the trace-truncation
hook in wavefront._fused_mesh_sorted_frame) one subprocess per stage;
prefix deltas = per-stage cost; 'full' re-checks the untruncated frame.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bigmesh_stages.py
Env: SPT_RES=512x384, SPT_CHAIN=8, plus every experiment knob the child
inherits (SPT_STAGES, SPT_CONDENSE, SPT_TRACE_SUBK, ...).
"""
import os
import subprocess
import sys

STAGES = ["bounce0", "sort1", "condense", "bounce1", "sort2", "frame",
          "uncondense", ""]

CHILD = r"""
import os, time
import numpy as np
from spt_tpu.utils.cache import enable_default_cache
enable_default_cache()
from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.engine.renderer import Renderer
from spt_tpu.scene import build_chair_grid_scene

W, H = (int(x) for x in os.environ.get("SPT_RES", "512x384").split("x"))
CHAIN = int(os.environ.get("SPT_CHAIN", "8"))
desc, center, radius = build_chair_grid_scene()
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4, ray_sort=True)
cam = Camera(position=tuple(center + np.array([0.3, 0.35, 1.0]) * radius),
             target=tuple(center), fov_degrees=45.0, aspect_ratio=W / H)
r = Renderer(desc, cfg, camera=cam)
r.camera.reset_movement_tracking()
r.render_frames(CHAIN)
_ = float(np.asarray(r.state.accum[:1]).sum())
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r.render_frames(CHAIN)
    _ = float(np.asarray(r.state.accum[:1]).sum())
    ts.append((time.perf_counter() - t0) / CHAIN * 1e3)
print(f"RESULT {float(np.median(ts)):.2f}", flush=True)
"""

prev = None
for stage in STAGES:
    env = dict(os.environ)
    if stage:
        env["SPT_SORT_ABLATE"] = stage
    else:
        env.pop("SPT_SORT_ABLATE", None)
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=1200)
    ms = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            ms = float(line.split()[1])
    name = stage or "full"
    if ms is None:
        print(f"{name:>10}: FAILED\n{out.stderr[-800:]}")
        continue
    delta = "" if prev is None else f"  (+{ms - prev:.2f})"
    print(f"{name:>10}: {ms:7.2f} ms{delta}", flush=True)
    prev = ms
