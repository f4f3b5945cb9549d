"""Wavefront integrator: staged pipeline with the depth loop on device.

The reference's GPU wavefront (OptixBackend.cpp:1506-1850) drives the
gen_primary -> [trace -> shade] x depth -> resolve pipeline from the HOST,
reading back queue counters twice per bounce (cudaStreamSynchronize at
:1677-1695, :1736-1748, :1780-1792 — its acknowledged hot spot, SURVEY.md §3.4).

The TPU version keeps the whole depth loop inside one jitted program as a
`lax.while_loop` keyed on the live-path count: zero host round-trips per
frame.  Atomic-counter index queues (device_programs.cu:268-273) are replaced
by the alive mask — lanes are SIMD, so "not enqueued" and "masked off" cost
the same — while per-bounce live counts (a `psum`-style reduction) provide the
early exit and the ray-throughput telemetry the reference printed on frame 0
(OptixBackend.cpp:1690-1695).

Returns per-bounce live-ray counts alongside radiance: the queue-conservation
invariant (rays in == hits + misses each bounce) that the reference asserted
by eyeball becomes a real test (SURVEY.md §4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from spt_tpu.config import RenderConfig
from spt_tpu.camera import CameraRays
from spt_tpu.env import Environment
from spt_tpu.lights import DeviceLights
from spt_tpu.integrators import transport
from spt_tpu.scene.flatten import DeviceScene


class WavefrontStats(NamedTuple):
    """Per-bounce telemetry (the frame-0 `rays N -> hits M -> next N'` log,
    OptixBackend.cpp:1690-1695, as device arrays)."""

    rays_per_bounce: jnp.ndarray   # (max_depth,) int32 — live rays traced
    bounces_run: jnp.ndarray       # () int32 — loop trips before early exit


def wavefront_sample(
    cfg: RenderConfig,
    scene: DeviceScene,
    env: Environment,
    lights: DeviceLights,
    camera: CameraRays,
    frame_index,
    sample_index: int = 0,
    row0=0,
    rows: int = None,
) -> Tuple[jnp.ndarray, WavefrontStats]:
    """One sample per pixel -> ((N, 3) radiance, stats)."""
    ps = transport.gen_primary(cfg, camera, frame_index, sample_index, row0, rows)
    rays0 = jnp.zeros((cfg.max_depth,), jnp.int32)

    def cond(carry):
        bounce, ps, _ = carry
        return (bounce < cfg.max_depth) & jnp.any(ps.alive)

    def body(carry):
        bounce, ps, rays = carry
        live = jnp.sum(ps.alive.astype(jnp.int32))
        rays = rays.at[bounce].set(live)
        hit = transport.trace_bounce(scene, ps)
        ps = transport.shade(
            cfg, scene, env, lights, ps, hit,
            bounce=bounce, is_last=(bounce == cfg.max_depth - 1),
        )
        return bounce + 1, ps, rays

    bounce, ps, rays = jax.lax.while_loop(cond, body, (jnp.int32(0), ps, rays0))
    return ps.radiance, WavefrontStats(rays_per_bounce=rays, bounces_run=bounce)


def render_wavefront(
    cfg: RenderConfig,
    scene: DeviceScene,
    env: Environment,
    lights: DeviceLights,
    camera: CameraRays,
    frame_index=0,
    row0=0,
    rows: int = None,
) -> Tuple[jnp.ndarray, WavefrontStats]:
    """cfg.spp samples -> ((rows, W, 3) linear radiance, summed stats)."""
    if rows is None:
        rows = cfg.height
    acc = jnp.zeros((cfg.width * rows, 3), jnp.float32)
    rays = jnp.zeros((cfg.max_depth,), jnp.int32)
    bounces = jnp.int32(0)
    for s in range(cfg.spp):
        rad, stats = wavefront_sample(
            cfg, scene, env, lights, camera, frame_index, s, row0, rows
        )
        acc = acc + rad
        rays = rays + stats.rays_per_bounce
        bounces = jnp.maximum(bounces, stats.bounces_run)
    img = (acc / cfg.spp).reshape(rows, cfg.width, 3)
    return img, WavefrontStats(rays_per_bounce=rays, bounces_run=bounces)
