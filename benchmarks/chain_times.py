"""Measurement utilities for the mesh (glTF chair) path.

Not part of the product surface — these are the scripts behind the numbers
in docs/DESIGN.md (run them from the repo root on the TPU host).  Use
16-frame chains and separate processes per config: per-dispatch overhead is
~2-4 ms, a host sync ~30-40 ms, and the axon client can abort when one
process runs several distinct large mesh programs (see
memory: axon-runtime-quirks / docs/DESIGN.md).
"""
import sys, time
import numpy as np
from spt_tpu.utils.cache import enable_default_cache
enable_default_cache()
from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.engine.renderer import Renderer
from spt_tpu.io.gltf import bounding_box, load_gltf
from spt_tpu.lights import LightManager

import os as _os
W, H = (int(x) for x in _os.environ.get("SPT_RES", "512x384").split("x"))
desc = load_gltf("/root/reference/assets/models/rattan_dining_chair/scene.gltf")
if _os.environ.get("SPT_NOTEX", "0") == "1":
    for m in desc.materials:
        m.base_color_texture = None
        m.metallic_roughness_texture = None
lo, hi = bounding_box(desc)
center = (lo + hi) / 2
extent = float(np.linalg.norm(hi - lo))

depth = int(sys.argv[1])
lights_on = sys.argv[2] == "1"
ray_sort = sys.argv[3] == "1"

import os
stages = int(os.environ.get("SPT_STAGES", "2"))
condense = os.environ.get("SPT_CONDENSE", "1") == "1"
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=depth, ray_sort=ray_sort,
                   ray_sort_stages=stages, condense=condense)
cam = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
             target=center, fov_degrees=60.0, aspect_ratio=W / H)
kw = {} if lights_on else {"lights": LightManager().device()}
r = Renderer(desc, cfg, camera=cam, **kw)
r.camera.reset_movement_tracking()
batched = _os.environ.get("SPT_CHAIN_BATCH", "1") == "1"
# Warm with the SAME program the timed loop runs: running the single-step
# AND the batched mesh program in one process trips the runtime
# re-execution abort, and the renderer gates batching off after a
# single-step run on an accel scene.
if batched:
    r.render_frames(16)
else:
    for _ in range(2):
        r.render_frame(check_camera=False)
_ = float(np.asarray(r.state.accum[:1]).sum())
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    if batched:
        r.render_frames(16)  # ONE dispatch (the product path for static cameras)
    else:
        for _ in range(16):
            r.render_frame(check_camera=False)
    _ = float(np.asarray(r.state.accum[:1]).sum())
    ts.append((time.perf_counter() - t0) / 16 * 1e3)
print(f"depth={depth} lights={lights_on} sort={ray_sort}: "
      f"{float(np.median(ts)):6.1f} ms/frame", flush=True)
