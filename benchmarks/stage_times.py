"""Per-stage device cost of the sorted mesh frame (glTF chair).

Sweeps SPT_SORT_ABLATE (the trace-truncation hook in
wavefront._fused_mesh_sorted_frame) by re-execing one subprocess per stage
— each prefix is a distinct program and the axon runtime prefers one large
program per process.  Prefix deltas = per-stage cost; 'full' re-checks the
untruncated frame.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/stage_times.py
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
from spt_tpu.io.gltf import bounding_box, load_gltf

W, H = (int(x) for x in os.environ.get("SPT_RES", "512x384").split("x"))
desc = load_gltf(
    "/root/reference/assets/models/rattan_dining_chair/scene.gltf")
lo, hi = bounding_box(desc)
center = (lo + hi) / 2
extent = float(np.linalg.norm(hi - lo))
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4, ray_sort=True)
cam = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
             target=center, fov_degrees=60.0, aspect_ratio=W / H)
r = Renderer(desc, cfg, camera=cam)
r.camera.reset_movement_tracking()
r.render_frames(16)
_ = float(np.asarray(r.state.accum[:1]).sum())
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r.render_frames(16)
    _ = float(np.asarray(r.state.accum[:1]).sum())
    ts.append((time.perf_counter() - t0) / 16 * 1e3)
print(f"RESULT {float(np.median(ts)):.2f}", flush=True)
"""

prev = None
prev_name = "(start)"
for stage in STAGES:
    env = dict(os.environ)
    env["SPT_SORT_ABLATE"] = stage
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=600)
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    if not line:
        print(f"{stage or 'full':10s} FAILED\n{out.stderr[-2000:]}")
        continue
    t = float(line[0].split()[1])
    name = stage or "full"
    delta = "" if prev is None else f"  (+{t - prev:5.2f} after {prev_name})"
    print(f"{name:10s} {t:6.2f} ms/frame{delta}", flush=True)
    prev, prev_name = t, name
