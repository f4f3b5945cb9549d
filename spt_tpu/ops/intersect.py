"""Ray-scene intersection: the TPU replacement for Embree/OptiX traversal.

The reference delegates to `rtcIntersect1` (PathTracer.cpp:77-99) /
`optixTrace` (device_programs.cu:279-310) against BVHs built by the vendor
libraries.  On TPU, traversal is ours.  This module provides the dense
("ray-stream") intersector: every ray is tested against every primitive in
fixed-size chunks with a running min — branchless, static-shaped, perfectly
lane-parallel VPU work.  For the reference's scenes (tens of primitives) this
is faster than any divergent traversal; large meshes use the BVH backend
(spt_tpu.ops.bvh) behind the same `trace(rays) -> Hit` interface, mirroring
how EmbreeBackend/OptixBackend both consume one SceneDesc (main.cpp:139-170).

Conventions:
- `t = INF` means miss (the reference uses t = -1 in HitRecord,
  device_programs.cu:748; INF composes better with running mins).
- Triangle normals are geometric, cross(e1, e2), unnormalized sign-stable —
  matching Embree's Ng and the GPU closesthit's vertex cross-product
  (device_programs.cu:761-820).  Integrators faceforward + normalize.
- `kind` tags: 0 miss, 1 triangle, 2 sphere (for the debug render modes,
  LaunchParams.h:76-78).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spt_tpu.ops import math3d as m3
from spt_tpu.scene.flatten import DeviceScene

INF = jnp.float32(jnp.inf)

KIND_MISS = 0
KIND_TRIANGLE = 1
KIND_SPHERE = 2

# Möller-Trumbore determinant cutoff (parallel-ray rejection).
_MT_EPS = 1e-9


class Hit(NamedTuple):
    """SoA hit record — the TPU HitRecord (LaunchParams.h:27-32)."""

    t: jnp.ndarray        # (N,) float32, INF on miss
    normal: jnp.ndarray   # (N, 3) geometric normal (not normalized)
    mat_id: jnp.ndarray   # (N,) int32
    kind: jnp.ndarray     # (N,) int32

    @property
    def hit_mask(self) -> jnp.ndarray:
        return jnp.isfinite(self.t)


def _chunk(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (arrays are padded to 8s)."""
    c = min(n, target)
    while n % c:
        c -= 1
    return c


def _tri_chunk_test(o, d, v0, e1, e2, tmin, tmax):
    """Möller-Trumbore for (N, C): returns (t, u-v-valid mask).

    o, d: (N, 3); v0, e1, e2: (C, 3). All ops broadcast to (N, C, ...) and
    fuse into the downstream min-reduction — nothing (N, C, 3) hits HBM.
    """
    dN = d[:, None, :]
    h = jnp.cross(dN, e2[None, :, :])                     # (N, C, 3)
    a = jnp.sum(e1[None, :, :] * h, axis=-1)              # (N, C)
    inv_a = 1.0 / jnp.where(jnp.abs(a) > _MT_EPS, a, 1.0)
    s = o[:, None, :] - v0[None, :, :]
    u = inv_a * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1[None, :, :])
    v = inv_a * jnp.sum(dN * q, axis=-1)
    t = inv_a * jnp.sum(e2[None, :, :] * q, axis=-1)
    valid = (
        (jnp.abs(a) > _MT_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax[:, None])
    )
    return jnp.where(valid, t, INF)


def _sph_chunk_test(o, d, center, radius, tmin, tmax):
    """Analytic sphere quadratic for (N, C) (the Embree user-geometry
    callback's math, EmbreeBackend.cpp:223-328). d must be normalized."""
    oc = o[:, None, :] - center[None, :, :]               # (N, C, 3)
    b = jnp.sum(oc * d[:, None, :], axis=-1)              # (N, C)
    c = jnp.sum(oc * oc, axis=-1) - radius[None, :] * radius[None, :]
    disc = b * b - c
    ok = (disc > 0.0) & (radius[None, :] > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    tmaxc = tmax[:, None]
    t = jnp.where((t0 > tmin) & (t0 < tmaxc), t0, t1)
    valid = ok & (t > tmin) & (t < tmaxc)
    return jnp.where(valid, t, INF)


def _scan_chunks(test_one_chunk, n_prims: int, chunk: int, init):
    """Run `test_one_chunk(start_index, carry) -> carry` over all chunks.
    Unrolled for few chunks (fully fused), lax.fori_loop beyond that (bounded
    code size for big scenes)."""
    n_chunks = n_prims // chunk
    if n_chunks <= 16:
        carry = init
        for ci in range(n_chunks):
            carry = test_one_chunk(ci * chunk, carry)
        return carry
    return jax.lax.fori_loop(
        0, n_chunks, lambda ci, carry: test_one_chunk(ci * chunk, carry), init
    )


def intersect(
    scene: DeviceScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin=1e-4,
    tmax=INF,
    chunk_size: int = 128,
) -> Hit:
    """Closest-hit trace of N rays against the whole scene.

    The running (best_t, best_prim, best_kind) carry replaces the BVH: each
    chunk contributes a (N, C) t-matrix whose row-min is folded in.  Normals
    and material ids are resolved once at the end by gathering with the
    winning primitive index — one gather instead of per-chunk bookkeeping.
    """
    n = origin.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    best_t = jnp.full((n,), INF)
    best_idx = jnp.zeros((n,), jnp.int32)
    best_kind = jnp.full((n,), KIND_MISS, jnp.int32)

    nt = scene.num_triangles
    if nt:
        c = _chunk(nt, chunk_size)

        def tri_chunk(start, carry):
            bt, bi, bk = carry
            v0 = jax.lax.dynamic_slice_in_dim(scene.tri_v0, start, c)
            e1 = jax.lax.dynamic_slice_in_dim(scene.tri_e1, start, c)
            e2 = jax.lax.dynamic_slice_in_dim(scene.tri_e2, start, c)
            t = _tri_chunk_test(origin, direction, v0, e1, e2, tmin, tmax)  # (N, C)
            tm = jnp.min(t, axis=1)
            am = jnp.argmin(t, axis=1).astype(jnp.int32) + start
            better = tm < bt
            return (
                jnp.where(better, tm, bt),
                jnp.where(better, am, bi),
                jnp.where(better, KIND_TRIANGLE, bk),
            )

        best_t, best_idx, best_kind = _scan_chunks(
            tri_chunk, nt, c, (best_t, best_idx, best_kind)
        )

    ns = scene.num_spheres
    if ns:
        c = _chunk(ns, chunk_size)

        def sph_chunk(start, carry):
            bt, bi, bk = carry
            ctr = jax.lax.dynamic_slice_in_dim(scene.sph_center, start, c)
            rad = jax.lax.dynamic_slice_in_dim(scene.sph_radius, start, c)
            t = _sph_chunk_test(origin, direction, ctr, rad, tmin, tmax)
            tm = jnp.min(t, axis=1)
            am = jnp.argmin(t, axis=1).astype(jnp.int32) + start
            better = tm < bt
            return (
                jnp.where(better, tm, bt),
                jnp.where(better, am, bi),
                jnp.where(better, KIND_SPHERE, bk),
            )

        best_t, best_idx, best_kind = _scan_chunks(
            sph_chunk, ns, c, (best_t, best_idx, best_kind)
        )

    # Resolve normal + material by gathering with the winning index.
    is_tri = best_kind == KIND_TRIANGLE
    is_sph = best_kind == KIND_SPHERE
    ti = jnp.where(is_tri, best_idx, 0)
    si = jnp.where(is_sph, best_idx, 0)

    tri_n = jnp.cross(scene.tri_e1[ti], scene.tri_e2[ti])
    hit_p = origin + jnp.where(jnp.isfinite(best_t), best_t, 0.0)[:, None] * direction
    sph_n = (hit_p - scene.sph_center[si]) / jnp.maximum(
        scene.sph_radius[si], 1e-12
    )[:, None]
    normal = jnp.where(is_tri[:, None], tri_n, jnp.where(is_sph[:, None], sph_n, 0.0))
    mat_id = jnp.where(
        is_tri, scene.tri_mat[ti], jnp.where(is_sph, scene.sph_mat[si], 0)
    ).astype(jnp.int32)

    return Hit(t=best_t, normal=normal, mat_id=mat_id, kind=best_kind)


def occluded(
    scene: DeviceScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin=1e-4,
    tmax=INF,
    chunk_size: int = 128,
) -> jnp.ndarray:
    """Any-hit shadow trace (rtcOccluded1, Light.cpp:16-40). Returns (N,) bool.

    Cheaper than `intersect`: only an OR-reduction of hit masks, no argmin,
    no normal/material resolution.
    """
    n = origin.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    blocked = jnp.zeros((n,), bool)

    nt = scene.num_triangles
    if nt:
        c = _chunk(nt, chunk_size)

        def tri_chunk(start, blocked):
            v0 = jax.lax.dynamic_slice_in_dim(scene.tri_v0, start, c)
            e1 = jax.lax.dynamic_slice_in_dim(scene.tri_e1, start, c)
            e2 = jax.lax.dynamic_slice_in_dim(scene.tri_e2, start, c)
            t = _tri_chunk_test(origin, direction, v0, e1, e2, tmin, tmax)
            return blocked | jnp.any(jnp.isfinite(t), axis=1)

        blocked = _scan_chunks(tri_chunk, nt, c, blocked)

    ns = scene.num_spheres
    if ns:
        c = _chunk(ns, chunk_size)

        def sph_chunk(start, blocked):
            ctr = jax.lax.dynamic_slice_in_dim(scene.sph_center, start, c)
            rad = jax.lax.dynamic_slice_in_dim(scene.sph_radius, start, c)
            t = _sph_chunk_test(origin, direction, ctr, rad, tmin, tmax)
            return blocked | jnp.any(jnp.isfinite(t), axis=1)

        blocked = _scan_chunks(sph_chunk, ns, c, blocked)

    return blocked


def safe_origin(hit_point: jnp.ndarray, normal: jnp.ndarray, front: jnp.ndarray):
    """Scale-aware self-intersection offset (PathTracer.cpp:101-111):
    eps = 1e-4 * max(1, |p|_inf), offset +n when `front` else -n."""
    mag = jnp.max(jnp.abs(hit_point), axis=-1)
    eps = 1e-4 * jnp.maximum(1.0, mag)
    sign = jnp.where(front, 1.0, -1.0)
    return hit_point + (sign * eps)[..., None] * normal
