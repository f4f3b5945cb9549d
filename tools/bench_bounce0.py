"""Isolate the real bounce-0 components on the chair (512x384, untextured
by default; SPT_TEX=1 keeps textures).

Times, each as a chained program (dispatch excluded, chain_times-style):
  gen    = gen_primary + swizzle
  trace  = standalone pallas_trace.closest_hit on the swizzled primaries
  frame  = the full depth-1 render_wavefront sample

Run ON THE TPU from the repo root: python -m tools.bench_bounce0
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.integrators import transport, wavefront
from spt_tpu.io.gltf import bounding_box, load_gltf
from spt_tpu.lights import LightManager
from spt_tpu.ops import pallas_trace
from spt_tpu.scene.flatten import flatten_scene
from spt_tpu.env import make_procedural_environment

W, H = 512, 384
N = W * H

desc = load_gltf("/root/reference/assets/models/rattan_dining_chair/scene.gltf")
if os.environ.get("SPT_TEX", "0") != "1":
    for m in desc.materials:
        m.base_color_texture = None
        m.metallic_roughness_texture = None
lo, hi = bounding_box(desc)
center = (lo + hi) / 2
extent = float(np.linalg.norm(hi - lo))
cfg = RenderConfig(width=W, height=H, spp=1, max_depth=1)
cam_obj = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
                 target=center, fov_degrees=60.0, aspect_ratio=W / H)
camera = cam_obj.rays()
scene = flatten_scene(desc)
env = make_procedural_environment()
lights = LightManager().device()  # no lights


def timed(name, fn, args):
    r = fn(*args)
    jax.block_until_ready(r)
    _ = float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[:1].sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[:1].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {float(np.median(ts)) / 16 * 1e3:6.2f} ms", flush=True)


R = 16

pixel, unswizzle = wavefront._swizzle(cfg, H, N, 0, square=True)


@jax.jit
def gen_chain(fi):
    def body(i, acc):
        ps = transport.gen_primary(cfg, camera, fi + i, 0, 0, None,
                                   pixel=pixel)
        return acc + ps.direction.x

    return jax.lax.fori_loop(0, R, body, jnp.zeros((N,), jnp.float32))


ps0 = jax.jit(lambda: transport.gen_primary(cfg, camera, 0, 0, 0, None,
                                            pixel=pixel))()
o, d = ps0.origin, ps0.direction


@jax.jit
def trace_chain(tmax0):
    def body(i, tm):
        hit = pallas_trace.closest_hit(scene.accel, scene, o, d,
                                       tmin=1e-4, tmax=1e30)
        return jnp.minimum(tm, jnp.where(jnp.isfinite(hit.t), hit.t, 1e30))

    return jax.lax.fori_loop(0, R, body, tmax0)


@jax.jit
def frame_chain(fi):
    def body(i, acc):
        rad, _ = wavefront.render_wavefront(cfg, scene, env, lights, camera,
                                            frame_index=fi + i)
        return acc + rad[0, 0]

    return jax.lax.fori_loop(0, R, body, jnp.zeros((3,), jnp.float32))


@jax.jit
def null_chain(fi):
    def body(i, acc):
        return acc * 0.9999 + jnp.float32(i)

    return jax.lax.fori_loop(0, R, body,
                             jnp.zeros((N,), jnp.float32) + fi)


which = sys.argv[1].split(",") if len(sys.argv) > 1 else ["null", "gen",
                                                          "trace", "frame"]
if "null" in which:
    timed("null  ", null_chain, [jnp.float32(0)])
if "gen" in which:
    timed("gen   ", gen_chain, [jnp.int32(0)])
if "trace" in which:
    timed("trace ", trace_chain, [jnp.full((N,), 1e30, jnp.float32)])
if "frame" in which:
    timed("frame ", frame_chain, [jnp.int32(0)])
