"""Mesh acceleration: Morton-ordered triangle clusters ("cluster BVH").

The reference gets BVHs for free from Embree (rtcCommitScene,
EmbreeBackend.cpp:181) and OptiX (optixAccelBuild, OptixBackend.cpp:916-1180).
A classic per-ray BVH descent is wrong for a vector machine: per-lane stacks
and data-dependent gathers serialize on TPU (measured: lane gathers are a 9x
loss even for simple compaction).  Instead we use the packet/stream-tracing
shape that SIMD ray tracers (including Embree's own packet mode) use:

- BUILD (host, numpy, once per scene): sort triangles by the Morton code of
  their AABB centroid, cut the sorted order into fixed-size clusters of
  `cluster_size` triangles, and store one AABB per cluster.  This is exactly
  the leaf level of an LBVH [Karras 2012] — the upper tree is replaced by a
  flat vector pass because the consumer culls at ray-TILE granularity, where
  a few hundred AABB tests are one broadcast VPU pass, cheaper than any
  branchy tree walk.
- TRAVERSE (device): one (C, S, 128) broadcast slab pass flags every cluster
  a ray tile might hit, a short scalar scan compacts the flagged ids into a
  front-to-back visit list (per ray-direction octant), and the triangle loop
  runs branch-free over exactly those clusters (ops/pallas_trace.py).
  Coherent primary and shadow rays open a handful of clusters; incoherent
  bounce rays degrade gracefully toward brute-force cost.

The XLA fallback (no Pallas) uses the same clusters with a running-min scan —
no tile culling, but still memory-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# Clusters per supercluster.  One super's streamed triangle block is
# SUPER_FAN * K * 512 B (K=64: 512 KiB) — the DMA granule of the
# HBM-streaming tracer for scenes whose tri_pack exceeds VMEM.
SUPER_FAN = 16

# Largest packed triangle table the VMEM tracer keeps resident.  Each
# (K, 24) cluster block pads to 128 lanes in VMEM, so a triangle costs
# 512 B resident — 12288 tris = 6 MiB, about the budget next to the ray
# tiles.  Scenes beyond this carry the 128-padded `tri_stream` table and
# stream clusters from HBM (ops/pallas_stream; routing in ops/intersect).
MAX_RESIDENT_TRIS = 12288


class MeshAccel(NamedTuple):
    """Cluster-sorted triangle soup + per-cluster AABBs (a pytree)."""

    cluster_lo: jnp.ndarray   # (C, 3) float32
    cluster_hi: jnp.ndarray   # (C, 3) float32
    tri_v0: jnp.ndarray       # (C*K, 3) sorted, padded with degenerates
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_mat: jnp.ndarray      # (C*K,) int32
    # Kernel-friendly packing of the same triangles: (C, K, 24) float32 with
    # columns [v0 | e1 | e2 | cross(e1,e2) | mat | uv0 duv1 duv2 | pad].  One
    # cluster is a dense (K, 24) VMEM block, so the Pallas tracer tests a whole cluster
    # against a ray row with (K, LANES) vector math instead of K serialized
    # scalar reads (see ops/pallas_trace.py).  Replaces what rtcCommitScene /
    # optixAccelBuild bake for their traversers (EmbreeBackend.cpp:181,
    # OptixBackend.cpp:916-1180).
    tri_pack: jnp.ndarray
    # Packed front-to-back traversal keys, one table per ray-direction
    # octant (the "direction-sorted traversal" classic SIMD tracers use).
    # cl_okey[oct, c, 0] = (rank << 16) | c, where rank is cluster c's
    # front-to-back position for that octant (box centroid dotted with the
    # octant sign vector).  The tracer masks unflagged clusters to INT32_MAX
    # and repeatedly min-extracts: one vector reduce per OPENED cluster
    # replaces the old per-cluster scalar compaction scan (which cost ~100ns
    # x C per trace and dominated mesh frames).  Front-to-back order makes
    # the any-hit early exit fire sooner; the id rides in the low 16 bits.
    cl_okey: jnp.ndarray      # (8, C, 1) int32
    # Supercluster level: AABBs over SUPER_FAN consecutive clusters (C is
    # padded to a SUPER_FAN multiple; empty padding boxes are inverted so
    # they never flag).  Used by the HBM-streaming trace path for scenes
    # whose tri_pack exceeds VMEM: the (C, S, 128) cluster slab pass becomes
    # a (G, S, 128) super pass plus per-OPENED-super (SUPER_FAN, S, 128)
    # child passes, so broadcast cost tracks the working set, not the scene
    # (the role of the upper BVH levels in rtcCommitScene /
    # optixAccelBuild's outputs, EmbreeBackend.cpp:181,
    # OptixBackend.cpp:916-1034).
    sup_lo: jnp.ndarray       # (G, 3) float32
    sup_hi: jnp.ndarray       # (G, 3) float32
    sup_okey: jnp.ndarray     # (8, G, 1) int32
    # tri_pack zero-padded from 24 to 128 columns — Mosaic DMA slices must
    # be 128-aligned on the last dim, so this is the table the streaming
    # tracer actually copies from.  Built only for scenes beyond
    # MAX_RESIDENT_TRIS (a (1, 1, 128) dummy otherwise): the VMEM tracer
    # never needs it, and small scenes shouldn't pay the 5.3x HBM copy.
    tri_stream: jnp.ndarray   # (C, K, 128) float32, or (1, 1, 128) dummy

    @property
    def num_clusters(self) -> int:
        return self.cluster_lo.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.tri_v0.shape[0] // self.cluster_lo.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized coords -> 30-bit Morton codes. x: (N, 3)
    in [0, 1]."""
    q = np.clip((x * 1024.0).astype(np.uint64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def build_mesh_accel(
    v0: np.ndarray,
    e1: np.ndarray,
    e2: np.ndarray,
    mat: np.ndarray,
    cluster_size: int = 64,
    uv: np.ndarray = None,
    force_stream: bool = False,
) -> MeshAccel:
    """Sort triangles along the Morton curve and cut into clusters.

    Prefers the native builder (native/spt_native.cpp, the rtcCommitScene
    role) and falls back to the vectorized numpy build.  Both operate on the
    cluster-size-padded soup and produce identical cluster AABBs (padding is
    degenerate and sorts last either way).
    """
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    mat = np.asarray(mat, np.int32)
    t = v0.shape[0]
    uv = (np.zeros((t, 6), np.float32) if uv is None
          else np.asarray(uv, np.float32).reshape(t, 6))

    pad = (-t) % cluster_size
    if pad:
        z = np.zeros((pad, 3), np.float32)
        v0 = np.concatenate([v0, z])
        e1 = np.concatenate([e1, z])
        e2 = np.concatenate([e2, z])
        mat = np.concatenate([mat, np.zeros(pad, np.int32)])
        uv = np.concatenate([uv, np.zeros((pad, 6), np.float32)])

    from spt_tpu.io import native

    built = native.cluster_build(v0, e1, e2, cluster_size)
    if built is not None:
        order, cl_lo, cl_hi = built
    else:
        v1 = v0 + e1
        v2 = v0 + e2
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)
        centroid = 0.5 * (lo + hi)
        degenerate = (np.abs(e1).sum(1) == 0) & (np.abs(e2).sum(1) == 0)
        scene_lo = centroid[~degenerate].min(0) if (~degenerate).any() else np.zeros(3)
        scene_hi = centroid[~degenerate].max(0) if (~degenerate).any() else np.ones(3)
        extent = np.maximum(scene_hi - scene_lo, 1e-12)
        norm = (centroid - scene_lo) / extent
        codes = _morton3(norm)
        codes[degenerate] = np.uint64(0xFFFFFFFFFFFF)  # padding sorts last
        order = np.argsort(codes, kind="stable")
        los, his = lo[order], hi[order]
        degs = degenerate[order]
        los = np.where(degs[:, None], np.inf, los)
        his = np.where(degs[:, None], -np.inf, his)
        c = v0.shape[0] // cluster_size
        cl_lo = los.reshape(c, cluster_size, 3).min(1)
        cl_hi = his.reshape(c, cluster_size, 3).max(1)
        cl_lo = np.where(np.isfinite(cl_lo), cl_lo, 1e30).astype(np.float32)
        cl_hi = np.where(np.isfinite(cl_hi), cl_hi, -1e30).astype(np.float32)

    v0s, e1s, e2s, mats, uvs = (v0[order], e1[order], e2[order], mat[order],
                                uv[order])

    # Pad the cluster count to a SUPER_FAN multiple so every supercluster
    # owns exactly SUPER_FAN consecutive clusters — a fixed-size block the
    # HBM-streaming tracer can DMA without edge cases.  Padding clusters are
    # degenerate (inverted AABBs, zero triangles): slab tests never flag
    # them.
    pad_c = (-cl_lo.shape[0]) % SUPER_FAN
    if pad_c:
        cl_lo = np.concatenate(
            [cl_lo, np.full((pad_c, 3), 1e30, np.float32)])
        cl_hi = np.concatenate(
            [cl_hi, np.full((pad_c, 3), -1e30, np.float32)])
        zt = np.zeros((pad_c * cluster_size, 3), np.float32)
        v0s = np.concatenate([v0s, zt])
        e1s = np.concatenate([e1s, zt])
        e2s = np.concatenate([e2s, zt])
        mats = np.concatenate([mats, np.zeros(pad_c * cluster_size, np.int32)])
        uvs = np.concatenate(
            [uvs, np.zeros((pad_c * cluster_size, 6), np.float32)])

    # Octant visit keys (front-to-back by centroid along the octant
    # direction; octant bit set = negative direction component).  Packed as
    # (rank << 16) | cluster_id so the tracer's min-extraction yields both
    # the visit order and the id in one reduce (see MeshAccel.cl_okey).
    c_total = cl_lo.shape[0]
    assert c_total <= (1 << 14), (
        f"{c_total} clusters overflow the 16-bit id / 15-bit rank packing"
    )
    cent_cl = np.where(cl_lo <= cl_hi, 0.5 * (cl_lo + cl_hi), 0.0)
    cl_okey = np.zeros((8, c_total), np.int32)
    ids = np.arange(c_total, dtype=np.int32)
    for o in range(8):
        sgn = np.array([-1.0 if (o >> 2) & 1 else 1.0,
                        -1.0 if (o >> 1) & 1 else 1.0,
                        -1.0 if o & 1 else 1.0])
        order = np.argsort(cent_cl @ sgn, kind="stable")
        rank = np.empty(c_total, np.int32)
        rank[order] = ids
        cl_okey[o] = (rank << 16) | ids

    pack = np.zeros((c_total * cluster_size, 24), np.float32)
    pack[:, 0:3] = v0s
    pack[:, 3:6] = e1s
    pack[:, 6:9] = e2s
    pack[:, 9:12] = np.cross(e1s, e2s)  # geometric normal, unnormalized
    pack[:, 12] = mats.astype(np.float32)
    pack[:, 13:19] = uvs                # texture uv0 | duv1 | duv2
    pack = pack.reshape(c_total, cluster_size, 24)

    # Supercluster level: one AABB over each SUPER_FAN-cluster block.
    # Inverted padding members drop out of the min/max naturally; an
    # all-padding super stays inverted and never flags.
    g_total = c_total // SUPER_FAN
    sup_lo = cl_lo.reshape(g_total, SUPER_FAN, 3).min(1).astype(np.float32)
    sup_hi = cl_hi.reshape(g_total, SUPER_FAN, 3).max(1).astype(np.float32)
    cent_sup = np.where(sup_lo <= sup_hi, 0.5 * (sup_lo + sup_hi), 0.0)
    sup_okey = np.zeros((8, g_total), np.int32)
    gids = np.arange(g_total, dtype=np.int32)
    for o in range(8):
        sgn = np.array([-1.0 if (o >> 2) & 1 else 1.0,
                        -1.0 if (o >> 1) & 1 else 1.0,
                        -1.0 if o & 1 else 1.0])
        gorder = np.argsort(cent_sup @ sgn, kind="stable")
        grank = np.empty(g_total, np.int32)
        grank[gorder] = gids
        sup_okey[o] = (grank << 16) | gids

    if force_stream or c_total * cluster_size > MAX_RESIDENT_TRIS:
        tri_stream = np.zeros((c_total, cluster_size, 128), np.float32)
        tri_stream[:, :, :24] = pack
    else:
        tri_stream = np.zeros((1, 1, 128), np.float32)

    return MeshAccel(
        cluster_lo=jnp.asarray(cl_lo.astype(np.float32)),
        cluster_hi=jnp.asarray(cl_hi.astype(np.float32)),
        tri_v0=jnp.asarray(v0s),
        tri_e1=jnp.asarray(e1s),
        tri_e2=jnp.asarray(e2s),
        tri_mat=jnp.asarray(mats),
        tri_pack=jnp.asarray(pack),
        cl_okey=jnp.asarray(cl_okey.reshape(8, c_total, 1)),
        sup_lo=jnp.asarray(sup_lo),
        sup_hi=jnp.asarray(sup_hi),
        sup_okey=jnp.asarray(sup_okey.reshape(8, g_total, 1)),
        tri_stream=jnp.asarray(tri_stream),
    )


def slab_test(lo, hi, o, inv_d, tmin, tmax):
    """Vectorized ray-AABB slab test.  lo/hi: scalars-per-axis or arrays;
    o/inv_d: Vec3 lanes.  Returns boolean hit mask."""
    t0x = (lo[0] - o.x) * inv_d.x
    t1x = (hi[0] - o.x) * inv_d.x
    t0y = (lo[1] - o.y) * inv_d.y
    t1y = (hi[1] - o.y) * inv_d.y
    t0z = (lo[2] - o.z) * inv_d.z
    t1z = (hi[2] - o.z) * inv_d.z
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), tmax),
    )
    return tnear <= tfar
