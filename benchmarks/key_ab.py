"""A/B the ray-sort key layout (SPT_SORT_KEY) on the big-mesh scene.

The chair measured octant-major as the best key (docs/DESIGN.md); the 4x4
chair grid is the scene the position-major layouts were built for — the
coarse morton bits separate the chairs, so a sorted tile's lanes should
target ONE chair's supercluster range instead of mixing all 16.  One
subprocess per key (the key is baked in at trace time).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/key_ab.py [keys...]
Env: SPT_RES (default 512x384), SPT_CHAIN (default 8), SPT_SCENE
(bigmesh|chair).
"""
import os
import subprocess
import sys

KEYS = sys.argv[1:] or ["octant", "hybrid", "morton"]

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
stages = int(os.environ.get("SPT_KEYAB_STAGES", "2"))
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4, ray_sort=True,
                   ray_sort_stages=stages)
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

for key in KEYS:
    env = dict(os.environ)
    env["SPT_SORT_KEY"] = key
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=1800)
    ms = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            ms = float(line.split()[1])
    if ms is None:
        print(f"{key:>8}: FAILED\n{out.stderr[-800:]}")
    else:
        print(f"{key:>8}: {ms:7.2f} ms/frame", flush=True)
