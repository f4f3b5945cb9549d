"""Shared subprocess harness for the mesh-frame A/B scripts.

One warmed chained-median renderer measurement per FRESH subprocess —
fresh because distinct large mesh programs in one process can abort the
axon client (docs/DESIGN.md "Environment quirks"), and because most knobs
(SPT_SORT_KEY, SPT_SORT_ABLATE, ...) are baked in at trace time.  The
child encodes the repo's measurement rules once (warmup with the SAME
program, CHAIN frames per sync, median of 3): a protocol fix here fixes
every A/B script at once (round-4 review finding — three drifting
copies).

Child knobs (env): SPT_RES (WxH, default 512x384), SPT_CHAIN (default 8),
SPT_SCENE (bigmesh | chair), SPT_CHILD_SORT_STAGES (optional
cfg.ray_sort_stages override), SPT_CHILD_NO_SHADOW (shadow_rays=False —
isolates the any-hit passes' share), plus whatever experiment knobs the
child inherits from the parent environment.
"""

import os
import subprocess
import sys

CHILD = r"""
import os, time
import numpy as np
from spt_tpu.utils.cache import enable_default_cache
enable_default_cache()
from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.engine.renderer import Renderer

W, H = (int(x) for x in os.environ.get("SPT_RES", "512x384").split("x"))
CHAIN = int(os.environ.get("SPT_CHAIN", "8"))
if os.environ.get("SPT_SCENE", "bigmesh") == "chair":
    from spt_tpu.io.gltf import bounding_box, load_gltf
    desc = load_gltf("/root/reference/assets/models/rattan_dining_chair/"
                     "scene.gltf")
    lo, hi = bounding_box(desc)
    center, radius = 0.5 * (lo + hi), float(np.linalg.norm(hi - lo))
else:
    from spt_tpu.scene import build_chair_grid_scene
    desc, center, radius = build_chair_grid_scene()
kw = {}
st = os.environ.get("SPT_CHILD_SORT_STAGES")
if st is not None:
    kw["ray_sort_stages"] = int(st)
if os.environ.get("SPT_CHILD_NO_SHADOW"):
    kw["shadow_rays"] = False  # measurement: isolates the any-hit share
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4, ray_sort=True,
                   **kw)
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


def run_child(env_overrides=None, timeout=1800):
    """Run one measurement child; returns (ms_per_frame or None,
    stderr_tail)."""
    env = dict(os.environ)
    env.update(env_overrides or {})
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1]), ""
    return None, out.stderr[-800:]
