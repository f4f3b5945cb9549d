"""Big-mesh A/B: HBM-streaming tracer vs the chunked-XLA brute force.

Builds a 4x4 grid of rattan chairs (~98k triangles — 8x past the VMEM
tracer's MAX_RESIDENT_TRIS, the scale the reference's backends handle as a
matter of course via rtcCommitScene / optixAccelBuild) and times:

  A. pallas_stream closest_hit + any_hit on one frame of primary rays
  B. the chunked-broadcast XLA fallback on the same rays
  C. a full end-to-end render through the Renderer (staged wavefront +
     streaming trace kernels), writing a PNG.

Run on the real TPU: python benchmarks/stream_ab.py [--skip-chunked]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIR = "/root/reference/assets/models/rattan_dining_chair/scene.gltf"


def build_chair_grid(nx: int = 4, nz: int = 4):
    from spt_tpu.scene import build_chair_grid_scene

    return build_chair_grid_scene(nx, nz, path=CHAIR)


def primary_rays(center, radius, width, height):
    from spt_tpu.camera import Camera
    from spt_tpu.config import RenderConfig
    from spt_tpu.integrators import transport

    cam = Camera(position=tuple(center + np.array([0.3, 0.35, 1.0]) * radius),
                 target=tuple(center), fov_degrees=45.0,
                 aspect_ratio=width / height)
    cfg = RenderConfig(width=width, height=height, spp=1, max_depth=2)
    ps = transport.gen_primary(cfg, cam.rays(), 0)
    return cam, cfg, ps.origin, ps.direction


def time_trace(scene, o, d, iters, label):
    import jax
    import jax.numpy as jnp

    from spt_tpu.ops import intersect as isect

    @jax.jit
    def chain(o, d):
        # each iteration's origin depends on the last result — no CSE, and
        # the perturbation is too small to change any hit
        t_acc = jnp.zeros_like(o.x)
        for i in range(iters):
            oi = type(o)(o.x + t_acc * 1e-12, o.y, o.z)
            hv = isect.intersect_v(scene, oi, d, 1e-4)
            t_acc = t_acc + jnp.where(jnp.isfinite(hv.t), hv.t, 0.0)
            blocked = isect.occluded_v(scene, oi, d, 1e-4,
                                       jnp.where(jnp.isfinite(hv.t), hv.t,
                                                 1e3))
            t_acc = t_acc + blocked.astype(jnp.float32)
        return t_acc

    out = chain(o, d)  # compile
    _ = float(np.asarray(out[:1])[0])
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(o, d)
        _ = float(np.asarray(out[:1])[0])
        trials.append((time.perf_counter() - t0) / iters)
    ms = float(np.median(trials)) * 1e3
    n = o.x.shape[0]
    print(f"{label}: {ms:.2f} ms per closest+any pair "
          f"({n / ms / 1e3:.1f} Mrays/s counting both)")
    return ms


def render_e2e(desc, center, radius, width, height, png):
    """Stage C: full end-to-end render through the Renderer (the fused
    stream-mode sorted pipeline), reporting ms/frame, and a PNG."""
    from spt_tpu.camera import Camera
    from spt_tpu.config import RenderConfig
    from spt_tpu.engine.renderer import Renderer

    cfg = RenderConfig(width=width, height=height, spp=1, max_depth=4)
    cam = Camera(position=tuple(center + np.array([0.3, 0.35, 1.0]) * radius),
                 target=tuple(center), fov_degrees=45.0,
                 aspect_ratio=width / height)
    r = Renderer(desc, cfg, camera=cam)
    r.camera.reset_movement_tracking()
    chain = 8
    r.render_frames(chain)
    _ = float(np.asarray(r.state.accum[:1]).sum())
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        r.render_frames(chain)
        _ = float(np.asarray(r.state.accum[:1]).sum())
        trials.append((time.perf_counter() - t0) / chain * 1e3)
    ms = float(np.median(trials))
    rays = int(np.asarray(r.last_stats.rays_per_bounce).sum()) // chain
    print(f"e2e: {ms:.1f} ms/frame, {rays / ms / 1e3:.1f} Mrays/s "
          f"(live rays only, depth {cfg.max_depth})")
    r.save_png(png)
    print(f"wrote {png}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-chunked", action="store_true")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--png", default="/tmp/stream_e2e.png")
    args = ap.parse_args()

    import jax.numpy as jnp

    from spt_tpu.scene.flatten import flatten_scene
    from spt_tpu.ops import intersect as isect

    desc, center, radius = build_chair_grid()
    scene = flatten_scene(desc)
    a = scene.accel
    n_tris = int(a.tri_v0.shape[0])
    print(f"tris {n_tris} clusters {a.num_clusters} "
          f"supers {a.sup_lo.shape[0]} "
          f"streaming {n_tris > 12288 and a.tri_stream.shape[0] > 1}")

    cam, cfg, o, d = primary_rays(center, radius, args.width, args.height)
    ms_stream = time_trace(scene, o, d, 8, "stream")

    if not args.skip_chunked:
        orig = isect._pallas_ok
        isect._pallas_ok = lambda *a, **k: False
        try:
            ms_chunk = time_trace(scene, o, d, 2, "chunked")
        finally:
            isect._pallas_ok = orig
        print(f"speedup {ms_chunk / ms_stream:.1f}x")

    if not args.skip_render:
        # Stage C in a clean scene/renderer (same process: the trace-kernel
        # programs above are small; the renderer program is the big one and
        # runs last so no later program re-executes after it)
        render_e2e(desc, center, radius, args.width, args.height, args.png)


if __name__ == "__main__":
    main()
