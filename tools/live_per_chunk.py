"""Per-chunk live-lane counts after each bounce on the chair (sizes the
condense gather width).  Chunk membership never changes under chunked
sorting, so unsorted masks give the exact per-chunk counts.

Run ON THE TPU: python -m tools.live_per_chunk
"""
import jax.numpy as jnp
import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.integrators import transport, wavefront
from spt_tpu.io.gltf import bounding_box, load_gltf
from spt_tpu.lights import LightManager
from spt_tpu.scene.flatten import flatten_scene
from spt_tpu.env import make_procedural_environment
from spt_tpu.ops import pallas_bounce

W, H = 512, 384
N = W * H
CHUNK = 8192

desc = load_gltf("/root/reference/assets/models/rattan_dining_chair/scene.gltf")
for m in desc.materials:
    m.base_color_texture = None
    m.metallic_roughness_texture = None
lo, hi = bounding_box(desc)
center = (lo + hi) / 2
extent = float(np.linalg.norm(hi - lo))
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4)
cam = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
             target=center, fov_degrees=60.0, aspect_ratio=W / H)
camera = cam.rays()
scene = flatten_scene(desc)
lights = LightManager()
lights.add_directional_light((0.4, -1.0, -0.3), (1.0, 0.95, 0.9), 1.0)
dl = lights.device()

pixel, _ = wavefront._swizzle(cfg, H, N, 0, square=True)
ps = transport.gen_primary(cfg, camera, 0, 0, 0, None, pixel=pixel)
for b in range(cfg.max_depth):
    counts = np.asarray(ps.alive).reshape(-1, CHUNK).sum(1)
    print(f"bounce {b}: live={int(counts.sum())} per-chunk "
          f"max={int(counts.max())} top5={sorted(counts)[-5:]}")
    ps, _ = pallas_bounce.fused_bounce(cfg, scene, dl, ps, b,
                                       b == cfg.max_depth - 1)
counts = np.asarray(ps.alive).reshape(-1, CHUNK).sum(1)
print(f"final   : live={int(counts.sum())} per-chunk max={int(counts.max())}")
