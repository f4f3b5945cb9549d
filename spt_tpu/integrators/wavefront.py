"""Wavefront integrator: staged pipeline with the depth loop on device.

The reference's GPU wavefront (OptixBackend.cpp:1506-1850) drives the
gen_primary -> [trace -> shade] x depth -> resolve pipeline from the HOST,
reading back queue counters twice per bounce (cudaStreamSynchronize at
:1677-1695, :1736-1748, :1780-1792 — its acknowledged hot spot, SURVEY.md §3.4).

The TPU version keeps the whole depth loop inside one jitted program as a
`lax.while_loop` keyed on the live-path count: zero host round-trips per
frame.  Two queueing strategies:

- **masked** (`cfg_compaction=False`): every bounce processes all N lanes
  with dead lanes masked — the simplest correct form.
- **compacted** (optional, MEASURED SLOWER — kept as a documented negative
  result): after the full-width primary bounce, live lanes are packed by a
  deterministic cumsum scan (ops/compaction.py — the atomicAdd ticket queues
  of device_programs.cu:268-273 without the races) and bounced in
  fixed-width chunks, so bounce k costs O(live_k) lanes instead of O(N).
  On TPU v5e this loses 9x (114 ms -> 1043 ms at 1080p): the per-chunk
  gather/scatter of 13 lane arrays through dynamic indices serializes on
  TPU's scalar gather path and dwarfs the masked-lane waste it removes.
  The GPU folklore (compaction pays) inverts on a machine whose lanes are
  free and whose gathers are not.  Default is masked; results are bitwise
  identical either way.

Returns per-bounce live-ray counts alongside radiance: the queue-conservation
invariant the reference asserted by eyeball (frame-0 log,
OptixBackend.cpp:1690-1695) becomes a real test (SURVEY.md §4).
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
from spt_tpu.ops.compaction import compact_indices
from spt_tpu.scene.flatten import DeviceScene


class WavefrontStats(NamedTuple):
    """Per-bounce telemetry (the frame-0 `rays N -> hits M -> next N'` log,
    OptixBackend.cpp:1690-1695, as device arrays)."""

    rays_per_bounce: jnp.ndarray   # (max_depth,) int32 — live rays traced
    bounces_run: jnp.ndarray       # () int32 — loop trips before early exit


def _queue_width(n: int) -> int:
    """Chunk width for the compacted bounce loop: ~1/4 of the lanes, floored
    to a lane-friendly multiple."""
    w = max(8192, n // 4)
    w = min(w, n)
    return ((w + 1023) // 1024) * 1024 if w >= 1024 else w


def _bounce(cfg, scene, env, lights, ps, bounce, is_last):
    hit = transport.trace_bounce(scene, ps)
    return transport.shade(cfg, scene, env, lights, ps, hit, bounce, is_last)


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
    compact: bool = False,
) -> Tuple[jnp.ndarray, WavefrontStats]:
    """One sample per pixel -> ((N, 3) radiance, stats)."""
    ps = transport.gen_primary(cfg, camera, frame_index, sample_index, row0, rows)
    n = ps.num_paths
    rays0 = jnp.zeros((cfg.max_depth,), jnp.int32)

    if not compact or cfg.max_depth == 1 or n < 16384:
        return _wavefront_masked(cfg, scene, env, lights, ps, rays0)

    # Primary bounce at full width (everything is live).
    rays0 = rays0.at[0].set(n)
    ps = _bounce(cfg, scene, env, lights, ps, 0, cfg.max_depth == 1)

    w = _queue_width(n)

    def cond(carry):
        bounce, ps, _ = carry
        return (bounce < cfg.max_depth) & jnp.any(ps.alive)

    def body(carry):
        bounce, ps, rays = carry
        queue, count = compact_indices(ps.alive)
        rays = rays.at[bounce].set(count)
        is_last = bounce == cfg.max_depth - 1

        def chunk(ci, ps):
            start = ci * w
            idx = jax.lax.dynamic_slice(queue, (start,), (w,))
            valid = (start + jnp.arange(w, dtype=jnp.int32)) < count
            sub = jax.tree.map(lambda a: a[idx], ps)
            sub = sub._replace(alive=sub.alive & valid)
            sub = _bounce(cfg, scene, env, lights, sub, bounce, is_last)
            # Scatter valid lanes home; padding redirects OOB and is dropped.
            target = jnp.where(valid, idx, n)
            return jax.tree.map(
                lambda dst, src: dst.at[target].set(src, mode="drop"), ps, sub
            )

        n_chunks = (count + (w - 1)) // w
        ps = jax.lax.fori_loop(0, n_chunks, chunk, ps)
        return bounce + 1, ps, rays

    bounce, ps, rays = jax.lax.while_loop(cond, body, (jnp.int32(1), ps, rays0))
    return ps.radiance.to_array(), WavefrontStats(rays_per_bounce=rays, bounces_run=bounce)


def _wavefront_masked(cfg, scene, env, lights, ps, rays0):
    """All-lanes-masked depth loop (the no-compaction fallback)."""

    def cond(carry):
        bounce, ps, _ = carry
        return (bounce < cfg.max_depth) & jnp.any(ps.alive)

    def body(carry):
        bounce, ps, rays = carry
        live = jnp.sum(ps.alive.astype(jnp.int32))
        rays = rays.at[bounce].set(live)
        ps = _bounce(cfg, scene, env, lights, ps, bounce,
                     bounce == cfg.max_depth - 1)
        return bounce + 1, ps, rays

    bounce, ps, rays = jax.lax.while_loop(cond, body, (jnp.int32(0), ps, rays0))
    return ps.radiance.to_array(), WavefrontStats(rays_per_bounce=rays, bounces_run=bounce)


def render_wavefront(
    cfg: RenderConfig,
    scene: DeviceScene,
    env: Environment,
    lights: DeviceLights,
    camera: CameraRays,
    frame_index=0,
    row0=0,
    rows: int = None,
    compact: bool = False,
) -> Tuple[jnp.ndarray, WavefrontStats]:
    """cfg.spp samples -> ((rows, W, 3) linear radiance, summed stats)."""
    if rows is None:
        rows = cfg.height
    acc = jnp.zeros((cfg.width * rows, 3), jnp.float32)
    rays = jnp.zeros((cfg.max_depth,), jnp.int32)
    bounces = jnp.int32(0)
    for s in range(cfg.spp):
        rad, stats = wavefront_sample(
            cfg, scene, env, lights, camera, frame_index, s, row0, rows,
            compact=compact,
        )
        acc = acc + rad
        rays = rays + stats.rays_per_bounce
        bounces = jnp.maximum(bounces, stats.bounces_run)
    img = (acc / cfg.spp).reshape(rows, cfg.width, 3)
    return img, WavefrontStats(rays_per_bounce=rays, bounces_run=bounces)
