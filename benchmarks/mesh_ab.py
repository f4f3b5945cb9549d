"""Measurement utilities for the mesh (glTF chair) path.

Not part of the product surface — these are the scripts behind the numbers
in docs/DESIGN.md (run them from the repo root on the TPU host).  Use
16-frame chains and separate processes per config: per-dispatch overhead is
~2-4 ms, a host sync ~30-40 ms, and the axon client can abort when one
process runs several distinct large mesh programs (see
memory: axon-runtime-quirks / docs/DESIGN.md).
"""
import dataclasses, time
import numpy as np

from spt_tpu.utils.cache import enable_default_cache
enable_default_cache()

from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.engine.renderer import Renderer
from spt_tpu.io.gltf import bounding_box, load_gltf
from bench import count_rays

W, H = 512, 384
PATH = "/root/reference/assets/models/rattan_dining_chair/scene.gltf"


def run(ray_sort: bool):
    desc = load_gltf(PATH)
    lo, hi = bounding_box(desc)
    center = (lo + hi) / 2
    extent = float(np.linalg.norm(hi - lo))
    cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4,
                       ray_sort=ray_sort)
    cam = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
                 target=center, fov_degrees=60.0, aspect_ratio=W / H)
    r = Renderer(desc, cfg, camera=cam)
    r.camera.reset_movement_tracking()
    for _ in range(2):
        r.render_frame(check_camera=False)
    _ = float(np.asarray(r.state.accum[:1]).sum())
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        stats = []
        for _ in range(4):
            r.render_frame(check_camera=False)
            stats.append(r.last_stats)
        _ = float(np.asarray(r.state.accum[:1]).sum())
        dt = time.perf_counter() - t0
        rays = sum(count_rays(s, cfg, 1) for s in stats)
        trials.append((rays / dt / 1e6, dt / 4))
    mrays = float(np.median([t[0] for t in trials]))
    ms = float(np.median([t[1] for t in trials])) * 1e3
    print(f"ray_sort={ray_sort}: {mrays:.2f} Mrays/s, {ms:.1f} ms/frame", flush=True)


import sys
modes = sys.argv[1:] or ["0", "1"]
for m in modes:
    run(m == "1")
