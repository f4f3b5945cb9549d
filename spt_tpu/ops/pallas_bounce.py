"""Fused trace+shade bounce as a Pallas TPU kernel.

The XLA wavefront pays one HBM round trip per fusion boundary — measured
~7.6 KB of HBM traffic per lane-bounce at 1080p, two orders of magnitude more
than the ~100 B of actual path state.  This kernel fuses the whole bounce —
primary trace, shadow trace, full shade_core — over VMEM-resident lane tiles:
each (TILE_ROWS, 128) block of the path state is read once, bounced entirely
in VMEM/registers, and written once.

It reuses the *same* transport code (`transport.shade_core`,
`intersect.intersect_v`) traced over Pallas refs — the scene, material, and
light tables are small enough to sit whole in VMEM, and all their accesses
are scalar reads, so the shared implementation traces unchanged.  The only
substitutions the kernel makes:

- material fetch: the per-lane table gather becomes a loop of masked selects
  over the (small) material table (`_gather_materials_select`) — TPU has no
  fast lane gather, and M<=16 materials cost ~12 selects each;
- environment: the HDR texture lookup (a real gather over a big image) stays
  OUTSIDE the kernel — shade_core returns the missed mask, and the caller
  adds `throughput * env(direction)` in XLA (transport.shade does the same
  split).

Dies cleanly into the XLA fallback when the scene is too big for full-VMEM
residency or the lane count doesn't tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.config import RenderConfig
from spt_tpu.lights import DeviceLights
from spt_tpu.materials import DeviceMaterials, LaneMaterials
from spt_tpu.ops import intersect as isect
from spt_tpu.ops.vec3 import Vec3
from spt_tpu.scene.flatten import DeviceScene

LANES = 128
TILE_ROWS = 64                   # 8192 lanes per grid step
TILE_ROWS_MESH = 8               # accel mode: finer tiles -> tighter unions
MAX_PALLAS_PRIMS = 192           # matches intersect.UNROLL_LIMIT
# Material fetch in-kernel is the masked-select loop
# (_gather_materials_select): cost grows linearly (12 selects per
# material per shade), so the cap trades shade cost against falling off
# the fused path entirely (a 10-50x loss).  64 materials ~ 800 vector
# ops per tile-shade — small next to a mesh frame's traversal (~80 % of
# device time) and strictly better than the staged fallback.
MAX_PALLAS_MATERIALS = 64
# Accel (mesh) modes:
# - "resident": the packed triangle table sits whole in VMEM next to the
#   path-state tiles — (C, K, 24) pads its minor dim to 128 lanes, so
#   C*K triangles cost C*K*512 bytes (12288 -> 6 MB).
# - "stream": beyond that, the 128-padded table stays in HBM and opened
#   superclusters DMA through a (SUPER_FAN, K, 128) VMEM scratch
#   (ops/pallas_stream's traversal run INSIDE the fused kernels), so the
#   fused fast path has no scene-size ceiling below the 16-bit cluster-id
#   packing (MAX_STREAM_CLUSTERS * K triangles; ~1M at K=64) — the any-size
#   role of rtcCommitScene / optixAccelBuild (EmbreeBackend.cpp:181,
#   OptixBackend.cpp:916-1034).
MAX_ACCEL_TRIS = 12288
# Analytic spheres in accel mode run an unrolled in-kernel pass (~25
# vector ops each, closest + shadow) BEFORE the cluster loop, so the cap
# trades a linear per-bounce cost against dropping the whole scene to the
# staged fallback (10-50x) — same reasoning as MAX_PALLAS_MATERIALS.
MAX_ACCEL_SPHERES = 32
MAX_STREAM_CLUSTERS = 1 << 14   # bvh cl_okey rank<<16|id packing limit


class _Col:
    """Adapter presenting a (T, 1) VMEM ref as a 1-D table.

    Mosaic cannot index the lane (minor) dimension of a 1-D VMEM array
    dynamically ("cannot statically prove index is a multiple of 128"), so
    1-D tables ride in as (T, 1) columns and scalar reads go through [i, 0].
    """

    def __init__(self, ref):
        self.ref = ref

    def __getitem__(self, i):
        return self.ref[i, 0]

    @property
    def shape(self):
        return (self.ref.shape[0],)


def _gather_materials_select(table, mat_id):
    """Material fetch as masked selects over the whole table — the lane-
    gather replacement for tiny tables (device_programs.cu:341-357 does the
    same clamp+load, just per thread)."""
    m_count = table.metallic.shape[0]
    z = jnp.zeros_like(mat_id, jnp.float32)
    bx, by, bz = z, z, z
    ex, ey, ez = z, z, z
    metallic, roughness, transparency = z, z, z
    ior = jnp.ones_like(mat_id, jnp.float32)
    mat_type = jnp.zeros_like(mat_id)
    texid = jnp.full_like(mat_id, -1)
    for m in range(m_count):
        sel = mat_id == m
        texid = jnp.where(sel, table.tex_id[m], texid)
        bx = jnp.where(sel, table.base_color[m, 0], bx)
        by = jnp.where(sel, table.base_color[m, 1], by)
        bz = jnp.where(sel, table.base_color[m, 2], bz)
        ex = jnp.where(sel, table.emission[m, 0], ex)
        ey = jnp.where(sel, table.emission[m, 1], ey)
        ez = jnp.where(sel, table.emission[m, 2], ez)
        metallic = jnp.where(sel, table.metallic[m], metallic)
        roughness = jnp.where(sel, table.roughness[m], roughness)
        ior = jnp.where(sel, table.ior[m], ior)
        mat_type = jnp.where(sel, table.mat_type[m], mat_type)
        transparency = jnp.where(sel, table.transparency[m], transparency)
    return LaneMaterials(
        base_color=Vec3(bx, by, bz),
        metallic=metallic,
        roughness=roughness,
        ior=ior,
        mat_type=mat_type,
        emission=Vec3(ex, ey, ez),
        transparency=transparency,
        tex_id=texid,
    )


def _tile_rows(rows: int) -> int:
    """Largest multiple-of-8 divisor of `rows` that is <= TILE_ROWS
    (Mosaic requires sublane-divisible blocks); falls back to `rows` itself
    when the whole array is one block."""
    for cand in range(min(TILE_ROWS, rows) // 8 * 8, 0, -8):
        if rows % cand == 0:
            return cand
    return rows if rows <= TILE_ROWS else 0


# The in-kernel NEE emitter pick must take shade_core's unrolled
# masked-select branch (its large-table alternative is a per-lane gather
# Mosaic cannot lower), so this cap may not exceed
# transport.NEE_SELECT_UNROLL (= 32).
MAX_PALLAS_EMITTERS = 32
# VMEM ceiling for the packed texture table (2 int32 planes per texture).
# materials.choose_tex_res budgets the per-scene resolution so ~any
# texture COUNT stays under this (64 textures at the 64^2 floor = 2 MiB);
# the gate exists for tables built with a raised SPT_TEX_BUDGET, where the
# user has explicitly traded fidelity against the triangle/state VMEM.
MAX_TEX_TABLE_BYTES = 4 << 20


def _tex_table_bytes(scene: DeviceScene) -> int:
    return 0 if scene.textures is None else scene.textures.size * 4


def _accel_mode(scene: DeviceScene):
    """Mesh scenes trace through the cluster tables inside the fused kernels
    instead of the rolled prim loops.  Returns "resident" (tri_pack whole in
    VMEM, pallas_trace.closest_hit_tile), "instanced" (shared BLAS resident
    in VMEM, TLAS of instance transforms, pallas_inst.inst_closest_tile),
    "stream" (tri_stream in HBM, pallas_stream.stream_closest_tile), or
    None (no accel path)."""
    if scene.num_triangles + scene.num_spheres <= MAX_PALLAS_PRIMS:
        return None
    if scene.num_spheres > MAX_ACCEL_SPHERES:
        return None
    if scene.inst is not None:
        return "instanced"
    a = scene.accel
    if a is None:
        return None
    if a.num_clusters * a.cluster_size <= MAX_ACCEL_TRIS:
        return "resident"
    if (a.tri_stream.shape[0] > 1
            and a.num_clusters <= MAX_STREAM_CLUSTERS):
        return "stream"
    return None


def explain_decline(scene: DeviceScene, lights: DeviceLights, n_lanes: int,
                    pad_ok: bool = False):
    """Human-readable reason the fused kernels decline this workload, or
    None when supports(...) is True.  Used to announce silent fallbacks to
    the staged XLA pipeline (a 10-50x slowdown a user should hear about)."""
    reasons = []
    n_prims = scene.num_triangles + scene.num_spheres
    if not (n_prims <= MAX_PALLAS_PRIMS or _accel_mode(scene)):
        a = scene.accel
        if a is None:
            reasons.append(
                f"{n_prims} primitives > {MAX_PALLAS_PRIMS} and no accel built"
            )
        else:
            if (a.num_clusters * a.cluster_size > MAX_ACCEL_TRIS
                    and a.tri_stream.shape[0] <= 1):
                reasons.append(
                    f"{a.num_clusters * a.cluster_size} accel triangles > "
                    f"MAX_ACCEL_TRIS={MAX_ACCEL_TRIS} and no streaming "
                    f"table built"
                )
            if a.num_clusters > MAX_STREAM_CLUSTERS:
                reasons.append(
                    f"{a.num_clusters} clusters > "
                    f"MAX_STREAM_CLUSTERS={MAX_STREAM_CLUSTERS}"
                )
            if scene.num_spheres > MAX_ACCEL_SPHERES:
                reasons.append(
                    f"{scene.num_spheres} spheres > "
                    f"MAX_ACCEL_SPHERES={MAX_ACCEL_SPHERES}"
                )
    if scene.materials.count > MAX_PALLAS_MATERIALS:
        reasons.append(f"{scene.materials.count} materials > "
                       f"MAX_PALLAS_MATERIALS={MAX_PALLAS_MATERIALS}")
    if scene.emitters is not None and scene.emitters.count > MAX_PALLAS_EMITTERS:
        reasons.append(f"{scene.emitters.count} emitters > "
                       f"MAX_PALLAS_EMITTERS={MAX_PALLAS_EMITTERS}")
    if scene.textures is not None:
        if not _accel_mode(scene):
            reasons.append("textured scene without accel mode "
                           "(in-kernel sampling needs the cluster tracer)")
        elif _tex_table_bytes(scene) > MAX_TEX_TABLE_BYTES:
            reasons.append(f"packed texture table {_tex_table_bytes(scene)}"
                           f" B > MAX_TEX_TABLE_BYTES={MAX_TEX_TABLE_BYTES}")
    if not reasons and not pad_ok:
        if n_lanes % LANES != 0 or _tile_rows(n_lanes // LANES) <= 0:
            reasons.append(f"lane count {n_lanes} does not tile into "
                           f"(rows, {LANES}) blocks")
    return "; ".join(reasons) if reasons else None


def announce_decline(scene: DeviceScene, lights: DeviceLights, n_lanes: int,
                     pad_ok: bool = False) -> None:
    """Log (once per distinct reason) why the fused path was declined."""
    reason = explain_decline(scene, lights, n_lanes, pad_ok)
    if reason and reason not in _announced:
        _announced.add(reason)
        import logging

        logging.getLogger("spt_tpu").warning(
            "fused Pallas path declined (%s); falling back to the staged "
            "XLA pipeline, which is far slower on TPU", reason
        )


_announced: set = set()


def supports(scene: DeviceScene, lights: DeviceLights, n_lanes: int,
             pad_ok: bool = False) -> bool:
    """Whether the fused kernels can run this workload.

    `pad_ok=True` is for fused_frame callers that pad dead lanes up to a
    64x128 multiple themselves (wavefront masked path); fused_bounce callers
    need the lane count to tile as-is."""
    scene_ok = (scene.num_triangles + scene.num_spheres <= MAX_PALLAS_PRIMS
                or _accel_mode(scene))
    if not (
        scene_ok
        and scene.materials.count <= MAX_PALLAS_MATERIALS
        and (scene.emitters is None or scene.emitters.count <= MAX_PALLAS_EMITTERS)
        # In-kernel texture sampling (tpu.dynamic_gather) works through the
        # cluster tracer's resolved uv, i.e. accel mode; small textured
        # scenes fall back to the staged XLA pipeline (the rolled prim
        # loops don't resolve uv).
        and (scene.textures is None
             or (_accel_mode(scene)
                 and _tex_table_bytes(scene) <= MAX_TEX_TABLE_BYTES))
    ):
        return False
    if pad_ok:
        return True
    return n_lanes % LANES == 0 and _tile_rows(n_lanes // LANES) > 0


def _rolled_closest(scene, o, d, tmin):
    """Closest hit with rolled fori_loops over prim tables (dynamic scalar
    VMEM reads) — tiny program, fast Mosaic compile; same math as the
    unrolled intersect._intersect_unrolled."""
    import numpy as _np

    INF = _np.float32(1e30)
    shape = o.x.shape
    z = jnp.zeros(shape, jnp.float32)
    carry0 = (jnp.full(shape, INF), jnp.zeros(shape, jnp.int32),
              jnp.zeros(shape, jnp.int32), z, z, z, z)
    n_tris = scene.tri_v0.shape[0]
    n_sphs = scene.sph_center.shape[0]
    MT = 1e-9

    def tri_body(i, carry):
        bt, bm, bk, ax, ay, az, rinv = carry
        v0x, v0y, v0z = scene.tri_v0[i, 0], scene.tri_v0[i, 1], scene.tri_v0[i, 2]
        e1x, e1y, e1z = scene.tri_e1[i, 0], scene.tri_e1[i, 1], scene.tri_e1[i, 2]
        e2x, e2y, e2z = scene.tri_e2[i, 0], scene.tri_e2[i, 1], scene.tri_e2[i, 2]
        hx = d.y * e2z - d.z * e2y
        hy = d.z * e2x - d.x * e2z
        hz = d.x * e2y - d.y * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        inv = 1.0 / jnp.where(jnp.abs(a) > MT, a, 1.0)
        sx, sy, sz = o.x - v0x, o.y - v0y, o.z - v0z
        u = inv * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = inv * (d.x * qx + d.y * qy + d.z * qz)
        t = inv * (e2x * qx + e2y * qy + e2z * qz)
        ok = ((jnp.abs(a) > MT) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > tmin) & (t < bt))
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        if scene.tri_ns is not None:
            # interpolated shading normal (scalar row reads); zero rows
            # keep the geometric normal (make_cluster_opener semantics)
            ns = scene.tri_ns
            snx = ns[i, 0] + u * ns[i, 3] + v * ns[i, 6]
            sny = ns[i, 1] + u * ns[i, 4] + v * ns[i, 7]
            snz = ns[i, 2] + u * ns[i, 5] + v * ns[i, 8]
            ns_ok = snx * snx + sny * sny + snz * snz > 1e-12
            nx = jnp.where(ns_ok, snx, nx)
            ny = jnp.where(ns_ok, sny, ny)
            nz = jnp.where(ns_ok, snz, nz)
        return (jnp.where(ok, t, bt),
                jnp.where(ok, scene.tri_mat[i], bm),
                jnp.where(ok, isect.KIND_TRIANGLE, bk),
                jnp.where(ok, nx, ax), jnp.where(ok, ny, ay),
                jnp.where(ok, nz, az), rinv)

    def sph_body(i, carry):
        bt, bm, bk, ax, ay, az, rinv = carry
        cx, cy, cz = (scene.sph_center[i, 0], scene.sph_center[i, 1],
                      scene.sph_center[i, 2])
        r = scene.sph_radius[i]
        ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
        b = ocx * d.x + ocy * d.y + ocz * d.z
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > tmin, t0, t1)
        ok = (disc > 0.0) & (r > 0.0) & (t > tmin) & (t < bt)
        return (jnp.where(ok, t, bt),
                jnp.where(ok, scene.sph_mat[i], bm),
                jnp.where(ok, isect.KIND_SPHERE, bk),
                jnp.where(ok, cx, ax), jnp.where(ok, cy, ay),
                jnp.where(ok, cz, az),
                jnp.where(ok, 1.0 / jnp.maximum(r, 1e-12), rinv))

    carry = jax.lax.fori_loop(0, n_tris, tri_body, carry0)
    bt, bm, bk, ax, ay, az, rinv = jax.lax.fori_loop(0, n_sphs, sph_body, carry)

    hitm = bk != isect.KIND_MISS
    t_safe = jnp.where(hitm, bt, 0.0)
    is_sph = bk == isect.KIND_SPHERE
    px = o.x + t_safe * d.x
    py = o.y + t_safe * d.y
    pz = o.z + t_safe * d.z
    normal = Vec3(
        jnp.where(is_sph, (px - ax) * rinv, ax),
        jnp.where(is_sph, (py - ay) * rinv, ay),
        jnp.where(is_sph, (pz - az) * rinv, az),
    )
    t_out = jnp.where(hitm, bt, jnp.float32(jnp.inf))
    return isect.HitV(t=t_out, normal=normal, mat_id=bm, kind=bk)


def _rolled_occluded(scene, o, d, tmin=1e-4, tmax=None):
    """Any-hit with rolled fori_loops (the kernel's shadow tracer)."""
    shape = o.x.shape
    tmax = jnp.broadcast_to(tmax, shape) if tmax is not None else jnp.full(shape, 1e30)
    MT = 1e-9
    n_tris = scene.tri_v0.shape[0]
    n_sphs = scene.sph_center.shape[0]

    def tri_body(i, blocked):
        v0x, v0y, v0z = scene.tri_v0[i, 0], scene.tri_v0[i, 1], scene.tri_v0[i, 2]
        e1x, e1y, e1z = scene.tri_e1[i, 0], scene.tri_e1[i, 1], scene.tri_e1[i, 2]
        e2x, e2y, e2z = scene.tri_e2[i, 0], scene.tri_e2[i, 1], scene.tri_e2[i, 2]
        hx = d.y * e2z - d.z * e2y
        hy = d.z * e2x - d.x * e2z
        hz = d.x * e2y - d.y * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        inv = 1.0 / jnp.where(jnp.abs(a) > MT, a, 1.0)
        sx, sy, sz = o.x - v0x, o.y - v0y, o.z - v0z
        u = inv * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = inv * (d.x * qx + d.y * qy + d.z * qz)
        t = inv * (e2x * qx + e2y * qy + e2z * qz)
        ok = ((jnp.abs(a) > MT) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > tmin) & (t < tmax))
        return blocked | ok.astype(jnp.int32)

    def sph_body(i, blocked):
        cx, cy, cz = (scene.sph_center[i, 0], scene.sph_center[i, 1],
                      scene.sph_center[i, 2])
        r = scene.sph_radius[i]
        ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
        b = ocx * d.x + ocy * d.y + ocz * d.z
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where((t0 > tmin) & (t0 < tmax), t0, t1)
        hit = (disc > 0.0) & (r > 0.0) & (t > tmin) & (t < tmax)
        return blocked | hit.astype(jnp.int32)

    # int32 carry: Mosaic cannot legalize bool (i1) fori_loop carries.
    blocked = jax.lax.fori_loop(0, n_tris, tri_body, jnp.zeros(shape, jnp.int32))
    blocked = jax.lax.fori_loop(0, n_sphs, sph_body, blocked)
    return blocked != 0


# plain int: weak-typed literal, stays int32 next to int32 operands
_TEXKEY_MISS = 0x7FFFFFFF


def env_in_kernel_ok(env) -> bool:
    """Static: should the fused kernels resolve the env term per bounce
    IN-KERNEL instead of deferring it to one XLA gather after the loop?

    This is the reference's structure — the env fetch lives inside the
    shade kernel (device_programs.cu:374-412) — and it is a measured LOSS
    on this machine: the hdr glass config renders at 442 ms/frame in-kernel
    vs 53 deferred (the fused frame's (64, 128) tiles pay the row-gather
    loop 8x per distinct map tile, and glass-scattered bounce misses touch
    many tiles).  OFF unless SPT_ENV_KERNEL=1; the production path stays
    the deferred flat XLA takes (the chunk-sorted Pallas variant also
    measured a loss — pallas_env.pallas_env_sorted_ok has the numbers).
    Kept tested for (8, 128)-tile mesh workloads.
    Needs an (8, 128)-tileable map; the decision must be static (callers
    skip their deferred gather at trace time), so it reads shapes, never
    values.
    """
    import os

    if env is None or os.environ.get("SPT_ENV_KERNEL", "0") != "1":
        return False
    h, w = env.image.shape[0], env.image.shape[1]
    return h >= 8 and h % 8 == 0 and w >= LANES and w % LANES == 0


def _sky_tile(d):
    """env.procedural_sky_v with the float pows replaced by integer
    squaring chains (Mosaic has no reliable f32 pow; x**8 and x**64 are
    3 and 6 squarings — bit-identical is not required, the oracle gates
    are tolerance-based)."""
    from spt_tpu.env import SUN_DIRECTION
    from spt_tpu.ops import math3d as m3

    t = m3.smoothstep(0.0, 1.0, 0.5 * (d.y + 1.0))
    sky = Vec3(0.7 * (1.0 - t) + 0.2 * t,
               0.8 * (1.0 - t) + 0.4 * t,
               0.9 * (1.0 - t) + 0.8 * t)
    sun = SUN_DIRECTION
    sun_dot = jnp.maximum(
        d.x * jnp.float32(sun[0]) + d.y * jnp.float32(sun[1])
        + d.z * jnp.float32(sun[2]), 0.0)
    p2 = sun_dot * sun_dot
    p8 = (p2 * p2) * (p2 * p2)
    p64 = ((p8 * p8) * (p8 * p8)) * ((p8 * p8) * (p8 * p8))
    glow = p64 + p8 * 0.3
    sky = sky + Vec3(glow * 1.0, glow * 0.9, glow * 0.7)
    return sky * 0.8


def _make_env_fn(env_dims, env_params, env_hbm, escratch, esem):
    """Build the kernel's env_fn(direction, need) -> Vec3 with
    env.environment_color_v's exact semantics (safe-normalize, bilinear
    equirect sample OR procedural sky selected by the `enabled` scalar,
    clamp * intensity): the tap setup runs on the polynomial inverse trig
    (ops/kernel_trig) and the texel gathers stream map tiles HBM -> VMEM
    (ops/pallas_env.env_gather_tile).  `env_params` is the (1, 4) f32 SMEM
    row [intensity, max_clamp, enabled, 0] — traced Environment scalars
    ride in as data, the map SHAPE is static."""
    from spt_tpu.ops import pallas_env
    from spt_tpu.ops import vec3 as v3

    h, w = env_dims
    wt = np.int32(w // LANES)
    n_tiles = np.int32((h // 8) * (w // LANES))

    def env_fn(direction, need):
        intensity = env_params[0, 0]
        max_clamp = env_params[0, 1]
        enabled = env_params[0, 2] > 0.0
        d = v3.safe_normalize(direction)
        taps = pallas_env.env_taps_tile(h, w, d)
        raw = pallas_env.env_gather_tile(env_hbm, escratch, esem, wt,
                                         n_tiles, need, *taps)
        tex = Vec3(jnp.minimum(raw.x, max_clamp) * intensity,
                   jnp.minimum(raw.y, max_clamp) * intensity,
                   jnp.minimum(raw.z, max_clamp) * intensity)
        sky = _sky_tile(d)
        return Vec3(jnp.where(enabled, tex.x, sky.x),
                    jnp.where(enabled, tex.y, sky.y),
                    jnp.where(enabled, tex.z, sky.z))

    return env_fn


def _gather_rc(tile, r, c, s, l):
    """tile[r[i,j], c[i,j]] for one (8, 128) tile and (s, l) index planes.
    Composes the two Mosaic dynamic_gather directions: a lane-gather picks
    column c within every sublane row, then a sublane-gather picks row r —
    valid because the indices are broadcast per OUTPUT row, so the row
    gather reads an (r, c) pair indexed by the same output lane."""
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, l), 0)
    acc = jnp.zeros((s, l), jnp.int32)
    for i in range(s):
        c_b = jnp.broadcast_to(c[i:i + 1], (8, l))
        r_b = jnp.broadcast_to(r[i:i + 1], (8, l))
        h = jnp.take_along_axis(tile, c_b, axis=1)
        g = jnp.take_along_axis(h, r_b, axis=0)
        acc = jnp.where(iota_s == i, jnp.broadcast_to(g[0:1], (s, l)), acc)
    return acc


def _make_texture_sampler(tex_ref, n_tex: int):
    """In-kernel bilinear sampler over packed VMEM texture tiles.

    `tex_ref`: (n_tex*tiles*2, 8, 128) int32 — row (t*tiles + q)*2
    + plane holds tile q of texture t (plane 0: sqrt-encoded 10/10/10
    baseColor; plane 1: 16/16 roughness/metallic multipliers; the flat
    res^2 image splits as flat = q<<10 | r<<7 | c, where res is the
    scene's VMEM-budgeted resolution recovered from the static shape:
    tiles = tex_ref.shape[0] / (2 * n_tex), res = sqrt(tiles * 1024)).

    Each of the 4 bilinear taps min-extracts the DISTINCT (texture, tile)
    keys the lane tile actually needs — the traversal trick
    (pallas_trace._visit_keys) applied to texturing: a while-loop runs one
    (8-row gather x 2 planes) pass per distinct key instead of a static
    n_tex x TEX_TILES mask loop, so cost tracks tile coherence, not table
    size.  Returns (rgb Vec3, roughness_mult, metallic_mult); lanes without
    a texture (tex_id < 0) return all-1 multipliers.
    """
    tiles = tex_ref.shape[0] // (2 * max(n_tex, 1))
    res = int(np.sqrt(tiles * 1024))

    def sample(_, tex_id, uvx, uvy):
        from spt_tpu.integrators.transport import _bilinear_setup
        from spt_tpu.materials import unpack_color, unpack_mr

        s, l = uvx.shape

        def tap(xi, yi):
            flat = yi * res + xi
            q = flat >> 10
            r = (flat >> 7) & 7
            c = flat & 127
            key = jnp.where(tex_id >= 0, tex_id * tiles + q,
                            _TEXKEY_MISS)

            def cond(carry):
                return jnp.min(carry[0]) < _TEXKEY_MISS

            def body(carry):
                k, pc, pm = carry
                m = jnp.min(k)
                sel = k == m
                gc = _gather_rc(tex_ref[m * 2], r, c, s, l)
                gm = _gather_rc(tex_ref[m * 2 + 1], r, c, s, l)
                return (jnp.where(sel, _TEXKEY_MISS, k),
                        jnp.where(sel, gc, pc), jnp.where(sel, gm, pm))

            _, pc, pm = jax.lax.while_loop(cond, body, (
                key, jnp.zeros((s, l), jnp.int32),
                jnp.full((s, l), -1, jnp.int32)))
            return pc, pm

        def compute(_op):
            (x0, x1, y0, y1), (wx, wy) = _bilinear_setup(uvx, uvy, res)
            acc = [jnp.zeros((s, l), jnp.float32) for _ in range(5)]
            for xi, wxi in ((x0, 1.0 - wx), (x1, wx)):
                for yi, wyi in ((y0, 1.0 - wy), (y1, wy)):
                    pc, pm = tap(xi, yi)
                    cr, cg, cb = unpack_color(pc)
                    ro, me = unpack_mr(pm)
                    w = wxi * wyi
                    for i, v in enumerate((cr, cg, cb, ro, me)):
                        acc[i] = acc[i] + w * v
            return tuple(acc)

        def ones(_op):
            one = jnp.ones((s, l), jnp.float32)
            return one, one, one, one, one

        # Whole-tile skip: sky/miss tiles have no textured-hit lane
        # (tex_id is -1 unless the lane HIT a textured material), so the
        # gather loops are skipped for most of the frame.
        out = jax.lax.cond(jnp.any(tex_id >= 0), compute, ones, 0)
        return Vec3(out[0], out[1], out[2]), out[3], out[4]

    return sample


def _make_trace_impls(accel_dims, accel_refs,
                      sph_c, sph_r, sph_m, n_sphs, with_uv: bool = False,
                      scratch=None, sem=None, scratch2=None, sem2=None):
    """Build the kernel's (closest(scene, ps), occluded(...)) pair.

    Small scenes stream the rolled prim loops; "resident" accel scenes
    traverse the VMEM cluster tables via pallas_trace's tile functions;
    "instanced" scenes traverse a TLAS of transforms over a shared VMEM
    BLAS via pallas_inst's tile functions; "stream" accel scenes traverse
    via pallas_stream's tile functions (tri_hbm in ANY space, DMA through
    `scratch`/`sem`).  Either way, path state stays in VMEM across
    trace+shade exactly like the small-scene path.

    `accel_refs` = (cl_lo, cl_hi, tri_pack, cl_okey, sup_lo, sup_hi,
    sup_okey, inst_tab, tri_hbm); unused members are 1-row dummies per
    mode ("instanced" repurposes the cluster slots for the BLAS tables and
    the super slots for the instance AABBs/keys)."""
    if accel_dims is None:
        def closest(scene, ps, bounce=None):
            return _rolled_closest(scene, ps.origin, ps.direction, tmin=0.0)

        def occluded(scene, o, d, tmin=1e-4, tmax=None, bounce=None):
            return _rolled_occluded(scene, o, d, tmin=tmin, tmax=tmax)

        return closest, occluded

    import numpy as _np

    mode, n_clusters, k, with_ns = accel_dims
    if mode == "stream":
        from spt_tpu.ops import pallas_stream

        cl_lo, cl_hi, _, cl_okey, sup_lo, sup_hi, sup_okey, _, tri_hbm = \
            accel_refs
        stream_refs = (cl_lo, cl_hi, cl_okey, sup_lo, sup_hi, sup_okey,
                       tri_hbm)

        def closest_res(ps, tmax, bounce=None):
            return pallas_stream.stream_closest_tile(
                stream_refs, k, n_sphs, _np.float32(0.0),
                sph_c, sph_r, sph_m, ps.origin, ps.direction, tmax,
                scratch, sem, with_uv=with_uv, with_ns=with_ns,
                scratch2=scratch2, sem2=sem2,
            )

        def any_res(o, d, tmin, tm, bounce=None):
            return pallas_stream.stream_any_tile(
                stream_refs, k, n_sphs, _np.float32(tmin),
                sph_c, sph_r, sph_m, o, d, tm, scratch, sem,
                scratch2=scratch2, sem2=sem2,
            )
    elif mode == "instanced":
        from spt_tpu.ops import pallas_inst

        inst_refs = accel_refs[:8]

        def closest_res(ps, tmax, bounce=None):
            return pallas_inst.inst_closest_tile(
                inst_refs, k, n_sphs, _np.float32(0.0),
                sph_c, sph_r, sph_m, ps.origin, ps.direction, tmax,
                with_uv=with_uv, bounce=bounce,
            )

        def any_res(o, d, tmin, tm, bounce=None):
            return pallas_inst.inst_any_tile(
                inst_refs, k, n_sphs, _np.float32(tmin),
                sph_c, sph_r, sph_m, o, d, tm, bounce=bounce,
            )
    else:
        from spt_tpu.ops import pallas_trace

        vmem_refs = accel_refs[:4]

        def closest_res(ps, tmax, bounce=None):
            return pallas_trace.closest_hit_tile(
                vmem_refs, n_clusters, k, n_sphs,
                _np.float32(0.0), sph_c, sph_r, sph_m,
                ps.origin, ps.direction, tmax, with_uv=with_uv,
            )

        def any_res(o, d, tmin, tm, bounce=None):
            return pallas_trace.any_hit_tile(
                vmem_refs, n_clusters, k, n_sphs,
                _np.float32(tmin), sph_c, sph_r, sph_m, o, d, tm,
            )

    def closest(scene, ps, bounce=None):
        # dead lanes trace with tmax = 0 (see transport.trace_bounce)
        tmax = jnp.where(ps.alive, _np.float32(1e30), _np.float32(0.0))
        res = closest_res(ps, tmax, bounce)
        t, nx, ny, nz, mat, kind = res[:6]
        t = jnp.where(kind != isect.KIND_MISS, t, jnp.float32(jnp.inf))
        return isect.HitV(t=t, normal=Vec3(nx, ny, nz), mat_id=mat, kind=kind,
                          uvx=res[6] if with_uv else None,
                          uvy=res[7] if with_uv else None)

    def occluded(scene, o, d, tmin=1e-4, tmax=None, bounce=None):
        tm = _np.float32(1e30) if tmax is None else tmax
        tm = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), o.x.shape)
        tm = jnp.minimum(tm, _np.float32(1e30))
        blocked = any_res(o, d, tmin, tm, bounce)
        return blocked != 0

    return closest, occluded


def _split_tail(accel_dims, env_dims, n_outs, rest):
    """Parse a kernel's trailing positional args: the optional env inputs
    (env_params SMEM row + pre-tiled map in ANY space), the `n_outs` output
    refs, then scratch in declaration order (stream DMA pair, env DMA
    pair).  Returns (env_fn_or_None, outs, stream_scratch_pair)."""
    if env_dims is not None:
        env_params, env_hbm = rest[0], rest[1]
        rest = rest[2:]
    outs, scratch = rest[:n_outs], rest[n_outs:]
    if accel_dims is not None and accel_dims[0] == "stream":
        from spt_tpu.ops.pallas_stream import _db_on

        nscr = 4 if _db_on() else 2
        stream_pair = tuple(scratch[:nscr]) + (None,) * (4 - nscr)
        scratch = scratch[nscr:]
    else:
        stream_pair = (None, None, None, None)
    env_fn = (_make_env_fn(env_dims, env_params, env_hbm, scratch[0],
                           scratch[1]) if env_dims is not None else None)
    return env_fn, outs, stream_pair


def _apply_env_term(env_fn, ps, new_ps, missed):
    """Per-bounce in-kernel env term, shared by _kernel and _frame_kernel:
    settle this bounce's misses NOW, while they are image-coherent
    (transport.shade's structure, in-kernel) — missed lanes keep their
    pre-bounce direction and throughput, and nothing is owed to the
    caller afterward."""
    env_c = env_fn(ps.direction, missed)
    zero = jnp.zeros_like(missed, jnp.float32)
    new_ps = new_ps._replace(radiance=Vec3(
        new_ps.radiance.x + jnp.where(missed, ps.throughput.x * env_c.x,
                                      zero),
        new_ps.radiance.y + jnp.where(missed, ps.throughput.y * env_c.y,
                                      zero),
        new_ps.radiance.z + jnp.where(missed, ps.throughput.z * env_c.z,
                                      zero),
    ))
    return new_ps, jnp.zeros_like(missed)


def _kernel(cfg: RenderConfig, has_emitters: bool, accel_dims, n_tex: int,
            env_dims, has_ns: bool,
            n_lights: int, n_tris: int, n_sphs: int, n_mats: int,
            # scalar params
            params_ref,
            # path state (blocked)
            ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, rng, alive, emok,
            # scene tables (full)
            tri_v0, tri_e1, tri_e2, tri_mat, tri_nsb, sph_c, sph_r, sph_m,
            m_base, m_metal, m_rough, m_ior, m_type, m_emis, m_trans, m_texid,
            l_kind, l_vec, l_color, l_int, l_att,
            e_v0, e_e1, e_e2, e_le, e_area,
            a_cl_lo, a_cl_hi, a_pack, a_cl_okey,
            a_sup_lo, a_sup_hi, a_sup_okey, a_inst, a_tex, tri_hbm,
            # then: optional env inputs, outputs, scratch (_split_tail)
            *rest):
    from spt_tpu.integrators import transport
    from spt_tpu.scene.flatten import EmitterTable

    bounce = params_ref[0, 0]
    is_last = params_ref[0, 1] > 0
    textured = n_tex > 0
    env_fn, outs, (scratch, sem, scratch2, sem2) = _split_tail(
        accel_dims, env_dims, 16, rest)
    (o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_tx, o_ty, o_tz,
     o_rx, o_ry, o_rz, o_rng, o_alive, o_emok, o_missed) = outs
    closest_impl, occluded_impl = _make_trace_impls(
        accel_dims, (a_cl_lo, a_cl_hi, a_pack, a_cl_okey,
                     a_sup_lo, a_sup_hi, a_sup_okey, a_inst, tri_hbm),
        sph_c, sph_r, sph_m, n_sphs, with_uv=textured,
        scratch=scratch, sem=sem, scratch2=scratch2, sem2=sem2,
    )
    texture_fn = _make_texture_sampler(a_tex, n_tex) if textured else None

    def live_tile():
        ps = transport.PathState(
            origin=Vec3(ox[:], oy[:], oz[:]),
            direction=Vec3(dx[:], dy[:], dz[:]),
            throughput=Vec3(tx[:], ty[:], tz[:]),
            radiance=Vec3(rx[:], ry[:], rz[:]),
            rng=rng[:].astype(jnp.uint32),
            alive=alive[:] != 0,
            emission_ok=emok[:] != 0,
        )
        emitters = EmitterTable(
            v0=e_v0, e1=e_e1, e2=e_e2, le=e_le, area=_Col(e_area)
        ) if has_emitters else None
        scene = DeviceScene(
            tri_v0=tri_v0, tri_e1=tri_e1, tri_e2=tri_e2, tri_mat=_Col(tri_mat),
            tri_ns=tri_nsb if has_ns else None,
            sph_center=sph_c, sph_radius=_Col(sph_r), sph_mat=_Col(sph_m),
            materials=DeviceMaterials(
                base_color=m_base, metallic=_Col(m_metal),
                roughness=_Col(m_rough), ior=_Col(m_ior), mat_type=_Col(m_type),
                emission=m_emis, transparency=_Col(m_trans),
                tex_id=_Col(m_texid),
            ),
            accel=None,
            emitters=emitters,
            textures=a_tex if textured else None,
        )
        lights = DeviceLights(
            kind=_Col(l_kind), vec=l_vec, color=l_color, intensity=_Col(l_int),
            attenuation=l_att,
        )

        hit = closest_impl(scene, ps, bounce=bounce)
        new_ps, missed = transport.shade_core(
            cfg, scene, lights, ps, hit, bounce, is_last,
            gather_materials=_gather_materials_select,
            occluded_fn=functools.partial(occluded_impl, bounce=bounce),
            texture_fn=texture_fn,
        )
        if env_fn is not None:
            new_ps, missed = _apply_env_term(env_fn, ps, new_ps, missed)

        o_ox[:], o_oy[:], o_oz[:] = new_ps.origin
        o_dx[:], o_dy[:], o_dz[:] = new_ps.direction
        o_tx[:], o_ty[:], o_tz[:] = new_ps.throughput
        o_rx[:], o_ry[:], o_rz[:] = new_ps.radiance
        o_rng[:] = new_ps.rng
        o_alive[:] = new_ps.alive.astype(jnp.int32)
        o_emok[:] = new_ps.emission_ok.astype(jnp.int32)
        o_missed[:] = missed.astype(jnp.int32)

    def dead_tile():
        o_ox[:], o_oy[:], o_oz[:] = ox[:], oy[:], oz[:]
        o_dx[:], o_dy[:], o_dz[:] = dx[:], dy[:], dz[:]
        o_tx[:], o_ty[:], o_tz[:] = tx[:], ty[:], tz[:]
        o_rx[:], o_ry[:], o_rz[:] = rx[:], ry[:], rz[:]
        o_rng[:] = rng[:].astype(jnp.uint32)
        o_alive[:] = jnp.zeros_like(alive[:])
        o_emok[:] = emok[:]
        o_missed[:] = jnp.zeros_like(alive[:])

    # Whole-tile early-out: by bounce 3 only a few percent of paths are live
    # and they cluster spatially (neighboring rays die on sky misses
    # together), so most tiles are entirely dead — copy state through and
    # skip all compute.  Recovers what queue compaction promises without
    # cross-lane traffic (which measures 9x slower on TPU).
    tile_alive = jnp.any(alive[:] != 0)
    pl.when(tile_alive)(live_tile)
    pl.when(jnp.logical_not(tile_alive))(dead_tile)


def _accel_inputs(scene: DeviceScene):
    """(accel_dims, n_tex, accel_tables, tri_tables, tri_stream) for the
    fused kernels.

    In accel mode the flat per-triangle tables are replaced by 1-row dummies
    (the cluster tracer reads tri_pack instead; keeping the real (C*K, 3)
    tables resident would waste MBs of VMEM).  The last accel table is the
    packed texture tile table (n_tex*TEX_TILES*2, 8, 128) int32 — row
    (t*TEX_TILES + q)*2 + plane; see _make_texture_sampler — or a 1-row
    dummy when untextured.  In "stream" mode tri_pack is a dummy too and
    `tri_stream` is the real 128-padded HBM table (rides in ANY space);
    otherwise tri_stream is a (1, 1, 128) dummy.  In "instanced" mode the
    cluster slots carry the shared BLAS tables, the super slots the TLAS
    (instance world AABBs + visit keys), and the (I, 16) transform table
    rides in the `inst` slot (a (1, 16) dummy for every other mode)."""
    def col(a):
        return a.reshape(-1, 1)

    mode = _accel_mode(scene)
    textured = mode is not None and scene.textures is not None
    if textured:
        tex = scene.textures.reshape(-1, 8, 128)
        n_tex = scene.textures.shape[0]
    else:
        tex = jnp.zeros((1, 8, 128), jnp.int32)
        n_tex = 0

    z83 = jnp.zeros((8, 3), jnp.float32)
    zi = jnp.zeros((8, 1, 1), jnp.int32)
    pack_dummy = jnp.zeros((1, 8, 24), jnp.float32)
    stream_dummy = jnp.zeros((1, 1, 128), jnp.float32)
    inst_dummy = jnp.zeros((1, 16), jnp.float32)

    ns_dummy = jnp.zeros((1, 9), jnp.float32)
    if mode is not None:
        a = scene.accel
        z13 = jnp.zeros((1, 3), jnp.float32)
        # accel modes read shading normals from tri_pack cols 19-23, not
        # the flat table
        tri_tables = [z13, z13, z13, jnp.zeros((1, 1), jnp.int32), ns_dummy]
        if mode == "instanced":
            # cluster slots carry the shared BLAS; super slots carry the
            # TLAS (instance world boxes + keys); inst is the transforms
            ia = scene.inst
            accel_tables = [ia.blas_lo, ia.blas_hi, ia.tri_pack,
                            ia.blas_okey, ia.inst_lo, ia.inst_hi,
                            ia.inst_okey, ia.inst, tex]
            return ((mode, ia.tri_pack.shape[0], ia.cluster_size,
                     ia.tri_pack.shape[-1] > 24), n_tex,
                    accel_tables, tri_tables, stream_dummy)
        if mode == "stream":
            accel_tables = [a.cluster_lo, a.cluster_hi, pack_dummy,
                            a.cl_okey, a.sup_lo, a.sup_hi, a.sup_okey,
                            inst_dummy, tex]
            tri_stream = a.tri_stream
        else:
            accel_tables = [a.cluster_lo, a.cluster_hi, a.tri_pack,
                            a.cl_okey, z83, z83, zi, inst_dummy, tex]
            tri_stream = stream_dummy
        return ((mode, a.num_clusters, a.cluster_size,
                 a.tri_pack.shape[-1] > 24), n_tex,
                accel_tables, tri_tables, tri_stream)
    accel_tables = [z83, z83, pack_dummy, zi, z83, z83, zi, inst_dummy, tex]
    tri_tables = [scene.tri_v0, scene.tri_e1, scene.tri_e2,
                  col(scene.tri_mat),
                  scene.tri_ns if scene.tri_ns is not None else ns_dummy]
    return None, n_tex, accel_tables, tri_tables, stream_dummy


def _stream_scratch_shapes(accel_dims):
    """Scratch for the "stream" accel mode: the (SUPER_FAN, K, 128) VMEM
    block opened superclusters DMA through, plus its semaphore (shared
    sequentially by the closest and shadow traces) — doubled when the
    double-buffered super loop is on (pallas_stream._db_on).  Empty
    otherwise."""
    if accel_dims is None or accel_dims[0] != "stream":
        return []
    from spt_tpu.ops.bvh import SUPER_FAN
    from spt_tpu.ops.pallas_stream import _db_on

    k = accel_dims[2]
    return [pltpu.VMEM((SUPER_FAN, k, 128), jnp.float32),
            pltpu.SemaphoreType.DMA] * (2 if _db_on() else 1)


def _env_setup(env):
    """(env_dims, extra inputs, extra in_specs, scratch) for the in-kernel
    env term, or all-empty when it doesn't engage (env_in_kernel_ok)."""
    if env is None or not env_in_kernel_ok(env):
        return None, [], [], []
    from spt_tpu.ops.pallas_env import env_pretile

    h, w = env.image.shape[0], env.image.shape[1]
    params = jnp.stack([
        jnp.asarray(env.intensity, jnp.float32),
        jnp.asarray(env.max_clamp, jnp.float32),
        jnp.asarray(env.enabled, jnp.float32),
        jnp.zeros((), jnp.float32),
    ]).reshape(1, 4)
    inputs = [params, env_pretile(env.image)]
    specs = [pl.BlockSpec((1, 4), lambda i: (0, 0),
                          memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.ANY)]
    scratch = [pltpu.VMEM((3, 8, LANES), jnp.float32),
               pltpu.SemaphoreType.DMA]
    return (h, w), inputs, specs, scratch


def fused_bounce(
    cfg: RenderConfig,
    scene: DeviceScene,
    lights: DeviceLights,
    ps,  # transport.PathState with (N,) planes
    bounce,
    is_last,
    env=None,
):
    """One full wavefront bounce in VMEM.  Returns (new_state, missed_mask).

    Equivalent to transport.trace_bounce + transport.shade_core; env must be
    applied by the caller exactly as transport.shade does — UNLESS `env` is
    given and env_in_kernel_ok(env): then each bounce's (image-coherent)
    misses are resolved in-kernel via the tile-streaming equirect sampler,
    the returned radiance already contains the env term, and the returned
    missed mask is all-False (nothing owed).
    """
    from spt_tpu.integrators import transport

    n = ps.rng.shape[0]
    rows = n // LANES
    shape2 = (rows, LANES)

    def r2(a):
        return a.reshape(shape2)

    state_in = [
        r2(ps.origin.x), r2(ps.origin.y), r2(ps.origin.z),
        r2(ps.direction.x), r2(ps.direction.y), r2(ps.direction.z),
        r2(ps.throughput.x), r2(ps.throughput.y), r2(ps.throughput.z),
        r2(ps.radiance.x), r2(ps.radiance.y), r2(ps.radiance.z),
        r2(ps.rng), r2(ps.alive.astype(jnp.int32)),
        r2(ps.emission_ok.astype(jnp.int32)),
    ]
    mats = scene.materials

    def col(a):
        return a.reshape(-1, 1)

    has_emitters = scene.emitters is not None and cfg.nee
    if has_emitters:
        em = scene.emitters
        emitter_tables = [em.v0, em.e1, em.e2, em.le, col(em.area)]
    else:
        z13 = jnp.zeros((1, 3), jnp.float32)
        emitter_tables = [z13, z13, z13, z13, jnp.zeros((1, 1), jnp.float32)]
    accel_dims, n_tex, accel_tables, tri_tables, tri_stream = \
        _accel_inputs(scene)
    env_dims, env_inputs, env_specs, env_scratch = _env_setup(env)
    tables = tri_tables + [
        scene.sph_center, col(scene.sph_radius), col(scene.sph_mat),
        mats.base_color, col(mats.metallic), col(mats.roughness), col(mats.ior),
        col(mats.mat_type), mats.emission, col(mats.transparency),
        col(mats.tex_id),
        col(lights.kind), lights.vec, lights.color, col(lights.intensity),
        lights.attenuation,
    ] + emitter_tables + accel_tables
    params = jnp.stack(
        [jnp.asarray(bounce, jnp.int32),
         jnp.asarray(is_last, jnp.int32)]
    ).reshape(1, 2)

    tile_rows = (TILE_ROWS_MESH
                 if accel_dims is not None and rows % TILE_ROWS_MESH == 0
                 else _tile_rows(rows))
    grid = (rows // tile_rows,)
    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(a):
        shp = a.shape
        return pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [block] * 15
        + [table_spec(a) for a in tables]
        + [pl.BlockSpec(memory_space=pltpu.ANY)]
        + env_specs
    )
    out_specs = [block] * 16
    f32 = jnp.float32
    out_shape = (
        [jax.ShapeDtypeStruct(shape2, f32)] * 12
        + [jax.ShapeDtypeStruct(shape2, jnp.uint32),
           jax.ShapeDtypeStruct(shape2, jnp.int32),
           jax.ShapeDtypeStruct(shape2, jnp.int32),
           jax.ShapeDtypeStruct(shape2, jnp.int32)]
    )

    kern = functools.partial(
        _kernel, cfg, has_emitters, accel_dims, n_tex, env_dims,
        accel_dims is None and scene.tri_ns is not None,
        lights.count,
        scene.num_triangles, scene.num_spheres, mats.count,
    )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_stream_scratch_shapes(accel_dims) + env_scratch,
    )(params, *state_in, *tables, tri_stream, *env_inputs)

    def r1(a):
        return a.reshape(n)

    new_ps = transport.PathState(
        origin=Vec3(r1(outs[0]), r1(outs[1]), r1(outs[2])),
        direction=Vec3(r1(outs[3]), r1(outs[4]), r1(outs[5])),
        throughput=Vec3(r1(outs[6]), r1(outs[7]), r1(outs[8])),
        radiance=Vec3(r1(outs[9]), r1(outs[10]), r1(outs[11])),
        rng=r1(outs[12]),
        alive=r1(outs[13]) != 0,
        emission_ok=r1(outs[14]) != 0,
    )
    missed = r1(outs[15]) != 0
    return new_ps, missed


# --- whole-frame kernel: the depth loop in VMEM ---------------------------------

def _frame_kernel(cfg: RenderConfig, has_emitters: bool, accel_dims,
                  n_tex: int, env_dims, has_ns: bool, n_sphs: int,
                  params_ref,
                  ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, rng, alive, emok,
                  tri_v0, tri_e1, tri_e2, tri_mat, tri_nsb, sph_c, sph_r, sph_m,
                  m_base, m_metal, m_rough, m_ior, m_type, m_emis, m_trans,
                  m_texid,
                  l_kind, l_vec, l_color, l_int, l_att,
                  e_v0, e_e1, e_e2, e_le, e_area,
                  a_cl_lo, a_cl_hi, a_pack, a_cl_okey,
                  a_sup_lo, a_sup_hi, a_sup_okey, a_inst, a_tex, tri_hbm,
                  # then: optional env inputs, outputs, scratch (_split_tail)
                  *rest):
    """The whole wavefront depth loop for one lane tile, entirely in VMEM.

    The per-bounce kernel still pays one HBM read+write of the full path
    state per bounce (6x per frame) plus a grid launch each.  Here each tile
    loads its state once, runs `while (bounce < max_depth) and any(alive)` —
    note: per-TILE adaptivity, a dead tile's loop exits after its own last
    live bounce, not the global one — and stores once.  Only what the caller
    needs comes back: final direction/throughput (for the deferred env term),
    radiance, the missed-ever mask, and per-bounce live-ray telemetry.
    """
    from spt_tpu.integrators import transport
    from spt_tpu.scene.flatten import EmitterTable

    bounce0 = params_ref[0, 0]
    textured = n_tex > 0

    env_fn, outs, (scratch, sem, scratch2, sem2) = _split_tail(
        accel_dims, env_dims, 11, rest)
    (o_dx, o_dy, o_dz, o_tx, o_ty, o_tz,
     o_rx, o_ry, o_rz, o_missed, o_bounces) = outs
    closest_impl, occluded_impl = _make_trace_impls(
        accel_dims, (a_cl_lo, a_cl_hi, a_pack, a_cl_okey,
                     a_sup_lo, a_sup_hi, a_sup_okey, a_inst, tri_hbm),
        sph_c, sph_r, sph_m, n_sphs, with_uv=textured,
        scratch=scratch, sem=sem, scratch2=scratch2, sem2=sem2,
    )
    texture_fn = _make_texture_sampler(a_tex, n_tex) if textured else None

    emitters = EmitterTable(
        v0=e_v0, e1=e_e1, e2=e_e2, le=e_le, area=_Col(e_area)
    ) if has_emitters else None
    scene = DeviceScene(
        tri_v0=tri_v0, tri_e1=tri_e1, tri_e2=tri_e2, tri_mat=_Col(tri_mat),
        tri_ns=tri_nsb if has_ns else None,
        sph_center=sph_c, sph_radius=_Col(sph_r), sph_mat=_Col(sph_m),
        materials=DeviceMaterials(
            base_color=m_base, metallic=_Col(m_metal),
            roughness=_Col(m_rough), ior=_Col(m_ior), mat_type=_Col(m_type),
            emission=m_emis, transparency=_Col(m_trans),
            tex_id=_Col(m_texid),
        ),
        accel=None,
        emitters=emitters,
        textures=a_tex if textured else None,
    )
    lights = DeviceLights(
        kind=_Col(l_kind), vec=l_vec, color=l_color, intensity=_Col(l_int),
        attenuation=l_att,
    )

    def cond(carry):
        bounce, *_ = carry
        alive_i = carry[13]
        return (bounce < cfg.max_depth) & jnp.any(alive_i != 0)

    def body(carry):
        (bounce, cox, coy, coz, cdx, cdy, cdz, ctx, cty, ctz,
         crx, cry, crz, calive, cemok, crng, cmissed, cbounces) = carry
        ps = transport.PathState(
            origin=Vec3(cox, coy, coz),
            direction=Vec3(cdx, cdy, cdz),
            throughput=Vec3(ctx, cty, ctz),
            radiance=Vec3(crx, cry, crz),
            rng=crng.astype(jnp.uint32),
            alive=calive != 0,
            emission_ok=cemok != 0,
        )
        hit = closest_impl(scene, ps, bounce=bounce)
        new_ps, missed = transport.shade_core(
            cfg, scene, lights, ps, hit, bounce,
            bounce == cfg.max_depth - 1,
            gather_materials=_gather_materials_select,
            occluded_fn=functools.partial(occluded_impl, bounce=bounce),
            texture_fn=texture_fn,
        )
        if env_fn is not None:
            new_ps, missed = _apply_env_term(env_fn, ps, new_ps, missed)
        return (bounce + 1,
                new_ps.origin.x, new_ps.origin.y, new_ps.origin.z,
                new_ps.direction.x, new_ps.direction.y, new_ps.direction.z,
                new_ps.throughput.x, new_ps.throughput.y, new_ps.throughput.z,
                new_ps.radiance.x, new_ps.radiance.y, new_ps.radiance.z,
                new_ps.alive.astype(jnp.int32),
                new_ps.emission_ok.astype(jnp.int32),
                new_ps.rng,
                cmissed | missed.astype(jnp.int32),
                cbounces + calive)

    zero_i = jnp.zeros_like(alive[:])
    carry = (bounce0,
             ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
             tx[:], ty[:], tz[:], rx[:], ry[:], rz[:],
             alive[:], emok[:], rng[:].astype(jnp.uint32), zero_i, zero_i)
    out = jax.lax.while_loop(cond, body, carry)
    (_, _, _, _, fdx, fdy, fdz, ftx, fty, ftz,
     frx, fry, frz, _, _, _, fmissed, fbounces) = out

    o_dx[:], o_dy[:], o_dz[:] = fdx, fdy, fdz
    o_tx[:], o_ty[:], o_tz[:] = ftx, fty, ftz
    o_rx[:], o_ry[:], o_rz[:] = frx, fry, frz
    o_missed[:] = fmissed
    o_bounces[:] = fbounces


def fused_frame(
    cfg: RenderConfig,
    scene: DeviceScene,
    lights: DeviceLights,
    ps,  # transport.PathState with (N,) planes
    start_bounce: int = 0,
    env=None,
):
    """Bounces [start_bounce, max_depth) of one sample in a single Pallas
    launch (start_bounce > 0 lets the caller run the primary bounce
    separately and reorder lanes in between — wavefront ray sorting).

    Returns (radiance Vec3, final_direction Vec3, final_throughput Vec3,
    missed_ever (N,) bool, rays_per_bounce (max_depth,) int32; entries below
    start_bounce are zero).  The caller owes `throughput * env(direction)`
    to missed lanes (deferred-env contract, transport.shade /
    wavefront._wavefront_masked) — UNLESS `env` is given and
    env_in_kernel_ok(env): then every bounce resolves its own misses
    in-kernel (see fused_bounce) and missed_ever returns all-False.
    """
    n = ps.rng.shape[0]
    rows = n // LANES
    shape2 = (rows, LANES)

    def r2(a):
        return a.reshape(shape2)

    state_in = [
        r2(ps.origin.x), r2(ps.origin.y), r2(ps.origin.z),
        r2(ps.direction.x), r2(ps.direction.y), r2(ps.direction.z),
        r2(ps.throughput.x), r2(ps.throughput.y), r2(ps.throughput.z),
        r2(ps.radiance.x), r2(ps.radiance.y), r2(ps.radiance.z),
        r2(ps.rng), r2(ps.alive.astype(jnp.int32)),
        r2(ps.emission_ok.astype(jnp.int32)),
    ]
    mats = scene.materials

    def col(a):
        return a.reshape(-1, 1)

    has_emitters = scene.emitters is not None and cfg.nee
    if has_emitters:
        em = scene.emitters
        emitter_tables = [em.v0, em.e1, em.e2, em.le, col(em.area)]
    else:
        z13 = jnp.zeros((1, 3), jnp.float32)
        emitter_tables = [z13, z13, z13, z13, jnp.zeros((1, 1), jnp.float32)]
    accel_dims, n_tex, accel_tables, tri_tables, tri_stream = \
        _accel_inputs(scene)
    env_dims, env_inputs, env_specs, env_scratch = _env_setup(env)
    tables = tri_tables + [
        scene.sph_center, col(scene.sph_radius), col(scene.sph_mat),
        mats.base_color, col(mats.metallic), col(mats.roughness), col(mats.ior),
        col(mats.mat_type), mats.emission, col(mats.transparency),
        col(mats.tex_id),
        col(lights.kind), lights.vec, lights.color, col(lights.intensity),
        lights.attenuation,
    ] + emitter_tables + accel_tables
    params = jnp.full((1, 2), start_bounce, jnp.int32)

    tile_rows = (TILE_ROWS_MESH
                 if accel_dims is not None and rows % TILE_ROWS_MESH == 0
                 else _tile_rows(rows))
    grid = (rows // tile_rows,)
    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def table_spec(a):
        shp = a.shape
        return pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [block] * 15
        + [table_spec(a) for a in tables]
        + [pl.BlockSpec(memory_space=pltpu.ANY)]
        + env_specs
    )
    out_specs = [block] * 11
    f32 = jnp.float32
    out_shape = (
        [jax.ShapeDtypeStruct(shape2, f32)] * 9
        + [jax.ShapeDtypeStruct(shape2, jnp.int32),
           jax.ShapeDtypeStruct(shape2, jnp.int32)]
    )

    kern = functools.partial(_frame_kernel, cfg, has_emitters, accel_dims,
                             n_tex, env_dims,
                             accel_dims is None and scene.tri_ns is not None,
                             scene.num_spheres)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_stream_scratch_shapes(accel_dims) + env_scratch,
    )(params, *state_in, *tables, tri_stream, *env_inputs)

    def r1(a):
        return a.reshape(n)

    direction = Vec3(r1(outs[0]), r1(outs[1]), r1(outs[2]))
    throughput = Vec3(r1(outs[3]), r1(outs[4]), r1(outs[5]))
    radiance = Vec3(r1(outs[6]), r1(outs[7]), r1(outs[8]))
    missed = r1(outs[9]) != 0
    # per-bounce live counts from per-lane bounce totals: a lane alive at
    # bounce b contributes iff it ran more than b bounces.
    bounces_done = r1(outs[10])
    rays = jnp.stack(
        [jnp.sum((bounces_done > b - start_bounce).astype(jnp.int32))
         if b >= start_bounce else jnp.int32(0)
         for b in range(cfg.max_depth)]
    )
    return radiance, direction, throughput, missed, rays
