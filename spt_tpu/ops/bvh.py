"""Mesh acceleration: spatially clustered triangle blocks ("cluster BVH").

The reference gets BVHs for free from Embree (rtcCommitScene,
EmbreeBackend.cpp:181) and OptiX (optixAccelBuild, OptixBackend.cpp:916-1180).
A classic per-ray BVH descent is wrong for a vector machine: per-lane stacks
and data-dependent gathers serialize on TPU (measured: lane gathers are a 9x
loss even for simple compaction).  Instead we use the packet/stream-tracing
shape that SIMD ray tracers (including Embree's own packet mode) use:

- BUILD (host, native C++ with a numpy fallback, once per scene): order the
  triangles spatially — default: recursive longest-axis object-median split
  with cluster-aligned cuts (_split_order; SPT_CLUSTER=morton restores the
  round-1..4.0 Morton-curve cut, which measures ~2x more cluster-AABB
  surface area on thin-feature meshes, tools/cluster_sim.py) — cut the
  order into fixed-size clusters of `cluster_size` triangles, and store one
  AABB per cluster.  This is the leaf level of a (median-split or LBVH
  [Karras 2012]) BVH — the upper tree is replaced by a flat vector pass
  because the consumer culls at ray-TILE granularity, where a few hundred
  AABB tests are one broadcast VPU pass, cheaper than any branchy tree
  walk.
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

# tri_pack width when per-triangle shading normals are present: cols 19-23
# hold [n0 | n1-n0 | n2-n0] quantized to 12 bits and packed two fields per
# column (see encode_ns; barycentric-interpolated at the winning hit — the
# loader fidelity the reference has, GLTFLoader.cpp:219-331 /
# EmbreeBackend.cpp:60-79, which its flat-shaded backends then discard).
# Packing halves the winner-resolution pick() passes the first (9-float,
# cols 19-27) layout paid — measured ~7% of the bigmesh frame.  Width 24
# (flat) and PACK_NS both pad to the same 128 VMEM lanes, so the resident
# cost per triangle is identical; the static width doubles as the kernels'
# with_ns flag (width > 24).
PACK_NS = 25

# 12-bit packed shading normals: each ns column holds TWO quantized fields
# q_hi * 4096 + q_lo with q in [1, 4095] — the packed value is <= 2^24 - 1,
# so the value itself, its masked-sum extraction in the cluster opener, and
# the split-back arithmetic (floor(p/4096), p - hi*4096) are all EXACT in
# float32.  q = 1 + round((v + 2) / NS_STEP) quantizes [-2, 2] (n0 is unit,
# dn1/dn2 are differences of units) in ~1e-3 steps: <= 0.06 deg of normal
# error, invisible next to the reference's flat shading.  A no-NORMAL mesh
# packs literal 0.0 in all five columns; the resolve treats all-zero planes
# as the geometric-fallback sentinel (q >= 1 keeps real encodings off it).
NS_FIELDS = ((0, 1), (2, 3), (4, 5), (6, 7), (8, None))
NS_STEP = np.float32(4.0 / 4094.0)


def encode_ns(ns: np.ndarray) -> np.ndarray:
    """(T, 9) float shading normals -> (T, 5) packed planes (NS_FIELDS
    layout); all-zero rows (the flat/no-NORMAL sentinel) stay all-zero."""
    ns = np.asarray(ns, np.float32).reshape(-1, 9)
    q = (1.0 + np.round((np.clip(ns, -2.0, 2.0) + np.float32(2.0))
                        / NS_STEP)).astype(np.float32)
    out = np.zeros((ns.shape[0], 5), np.float32)
    for c, (hi, lo) in enumerate(NS_FIELDS):
        v = q[:, hi] * np.float32(4096.0)
        if lo is not None:
            v = v + q[:, lo]
        out[:, c] = v
    out[np.abs(ns).max(axis=1) == 0.0] = 0.0
    return out


def decode_ns(planes: np.ndarray) -> np.ndarray:
    """(T, 5) packed planes -> (T, 9) QUANTIZED float shading normals —
    exactly the values the kernels' winner resolution reconstructs
    (identical float32 ops), so flatten stores these in tri_ns and the
    XLA trace paths + the CPU oracle agree with the Pallas kernels
    bit-for-bit.  All-zero rows stay zero (geometric fallback)."""
    planes = np.asarray(planes, np.float32).reshape(-1, 5)
    out = np.zeros((planes.shape[0], 9), np.float32)
    for c, (hi, lo) in enumerate(NS_FIELDS):
        h = np.floor(planes[:, c] * np.float32(1.0 / 4096.0)).astype(
            np.float32)
        out[:, hi] = (h - np.float32(1.0)) * NS_STEP - np.float32(2.0)
        if lo is not None:
            lq = planes[:, c] - h * np.float32(4096.0)
            out[:, lo] = (lq - np.float32(1.0)) * NS_STEP - np.float32(2.0)
    out[np.abs(planes).max(axis=1) == 0.0] = 0.0
    return out


def quantize_ns(ns: np.ndarray) -> np.ndarray:
    """Round-trip a (T, 9) shading-normal table through the 12-bit packing
    (what every renderer path actually shades with)."""
    return decode_ns(encode_ns(ns))

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


class InstAccel(NamedTuple):
    """Two-level instanced acceleration: a TLAS of instance AABBs over
    shared per-mesh BLAS cluster tables (a pytree).

    The reference's OptiX backend builds one GAS per mesh and an IAS of
    transformed instances over them (OptixBackend.cpp:916-1034, instance
    build at :1036-1180); Embree gets the same from rtcCommitScene over
    instance geometry.  On TPU the same two-level idea keeps the BLAS
    triangle tables VMEM-resident when the *unique* geometry fits, even
    though the flattened world-space scene would be many times the budget:
    a 4x4 grid of 6.1k-tri chairs is 98k replicated triangles but one 3 MB
    BLAS plus 16 transforms.

    Traversal (ops/pallas_inst.py): slab-test the I instance world boxes
    against the ray tile, min-extract front-to-back, and per opened
    instance transform the rays into object space (object_from_world is
    affine, so t along the UNnormalized transformed direction equals world
    t — bounds and winner folding need no rescaling) and run the usual
    cluster traversal over that mesh's BLAS range.  Hit normals transform
    back by the inverse-transpose (= R_ofw^T applied to the object normal).

    Shapes are chosen so every static dim is recoverable in-kernel:
    blas_lo (M, CMAX, 3) gives M and CMAX; tri_pack stays flat
    ((M*CMAX, K, 24)) so a cluster load stays one (K, 24) block.
    """

    blas_lo: jnp.ndarray    # (M, CMAX, 3) object-space cluster AABBs
    blas_hi: jnp.ndarray    # (M, CMAX, 3); padding clusters inverted
    # (8*M, CMAX, 1) rank<<16 | LOCAL cluster id; row (octant * M + mesh).
    # Flattened to ONE leading dim so the kernel's lookup is a single
    # dynamic index — the Mosaic-proven pattern (tri_pack[m]); a (8, M,
    # CMAX, 1) table would need a double dynamic index.
    blas_okey: jnp.ndarray
    tri_pack: jnp.ndarray   # (M*CMAX, K, 24) packed object-space triangles
    inst_lo: jnp.ndarray    # (I, 3) world-space instance AABBs
    inst_hi: jnp.ndarray    # (I, 3)
    inst_okey: jnp.ndarray  # (8, I, 1) rank<<16 | instance id
    # (I, 16) float32: [R_ofw row-major 0:9 | t_ofw 9:12 | mesh 12 |
    # material override or -1 13 | sign(det) 14 | pad 15] — one scalar-read
    # row per opened instance (the launch-params role of
    # OptixInstance.transform).  sign(det) keeps a MIRRORED instance's
    # geometric normal oriented like the flattened path's world-space
    # cross product (world e1 x e2 = det(R_wfo) * R_ofw^T (e1_o x e2_o)).
    inst: jnp.ndarray

    @property
    def num_instances(self) -> int:
        return self.inst.shape[0]

    @property
    def num_meshes(self) -> int:
        return self.blas_lo.shape[0]

    @property
    def cmax(self) -> int:
        return self.blas_lo.shape[1]

    @property
    def cluster_size(self) -> int:
        return self.tri_pack.shape[1]


def build_inst_accel(meshes, instances, cluster_size: int = 64) -> InstAccel:
    """Build the TLAS/BLAS pair from object-space meshes + transforms.

    `meshes`: list of (v0, e1, e2, mat, uv[, ns]) object-space triangle
    arrays (mat is the mesh-local resolved material, uv the (T, 6) packed
    texcoords or None, ns the optional (T, 9) packed shading normals —
    object space; the traversal's finish hook transforms them to world
    like geometric normals, minus the sign(det) winding factor).
    `instances`: list of (mesh_idx,
    world_from_object (4, 4), mat_override) with mat_override = -1 for
    "use the BLAS material".  Raises ValueError for a singular instance
    transform (a det-0 instance flattens geometry onto a plane that is
    still hittable in world space — only the flattened path can render
    it)."""
    meshes = [m if len(m) >= 6 else m + (None,) for m in meshes]
    # one mesh with normals widens every BLAS pack (the flat tri_pack must
    # be one array); normal-less meshes pack zero ns -> geometric fallback
    any_ns = any(m[5] is not None for m in meshes)
    blas = [build_mesh_accel(
        v0, e1, e2, mat, cluster_size=cluster_size, uv=uv,
        ns=(ns if ns is not None
            else (np.zeros((v0.shape[0], 9), np.float32) if any_ns
                  else None)))
            for (v0, e1, e2, mat, uv, ns) in meshes]
    # build_mesh_accel pads its cluster count to a SUPER_FAN multiple for
    # its own supercluster level; the instance level replaces superclusters
    # here, so trim each BLAS back to the clusters that hold real triangles
    # (the all-padding tail: degenerates sort last on the Morton curve)
    real_c = [-(-m[0].shape[0] // cluster_size) for m in meshes]
    cmax = max(real_c)
    k = cluster_size
    m_count = len(blas)

    lo = np.full((m_count, cmax, 3), 1e30, np.float32)
    hi = np.full((m_count, cmax, 3), -1e30, np.float32)
    okey = np.zeros((8, m_count, cmax), np.int32)
    pack_w = PACK_NS if any_ns else 24
    pack = np.zeros((m_count * cmax, k, pack_w), np.float32)
    obj_lo = np.zeros((m_count, 3), np.float32)
    obj_hi = np.zeros((m_count, 3), np.float32)
    # padding entries: unique well-formed keys past every real rank (their
    # clusters never flag, so the keys are never extracted)
    pad_ids = np.arange(cmax, dtype=np.int32)
    for mi, b in enumerate(blas):
        c = real_c[mi]
        lo[mi, :c] = np.asarray(b.cluster_lo)[:c]
        hi[mi, :c] = np.asarray(b.cluster_hi)[:c]
        okey[:, mi, :] = (pad_ids << 16) | pad_ids
        okey[:, mi, :c] = np.asarray(b.cl_okey).reshape(8, -1)[:, :c]
        pack[mi * cmax:mi * cmax + c] = np.asarray(b.tri_pack)[:c]
        valid = lo[mi, :, 0] <= hi[mi, :, 0]
        if valid.any():
            obj_lo[mi] = lo[mi, valid].min(0)
            obj_hi[mi] = hi[mi, valid].max(0)

    i_count = len(instances)
    if i_count > (1 << 14):
        # ValueError so _maybe_build_inst declines to the streamed
        # flattened path (mass instancing past the key packing is a valid
        # scene, just not an instanced-tier one)
        raise ValueError(
            f"{i_count} instances overflow the 16-bit id / 15-bit rank "
            "packing"
        )
    inst_lo = np.zeros((i_count, 3), np.float32)
    inst_hi = np.zeros((i_count, 3), np.float32)
    inst = np.zeros((i_count, 16), np.float32)
    for ii, (mesh_idx, xf, mat_ov) in enumerate(instances):
        xf = np.asarray(xf, np.float64).reshape(4, 4)
        det = np.linalg.det(xf[:3, :3])
        if abs(det) < 1e-12:
            raise ValueError(
                f"instance {ii}: singular world_from_object (det ~ 0); "
                "only the flattened path renders degenerate instances"
            )
        ofw = np.linalg.inv(xf)
        inst[ii, 0:9] = ofw[:3, :3].reshape(9)
        inst[ii, 9:12] = ofw[:3, 3]
        inst[ii, 12] = mesh_idx
        inst[ii, 13] = mat_ov
        inst[ii, 14] = 1.0 if det > 0 else -1.0
        # world AABB of the transformed object box: per-axis interval
        # arithmetic on the affine map (equivalent to the 8-corner method)
        r_wfo = xf[:3, :3]
        t_wfo = xf[:3, 3]
        a = r_wfo * obj_lo[mesh_idx][None, :]
        b2 = r_wfo * obj_hi[mesh_idx][None, :]
        inst_lo[ii] = (t_wfo + np.minimum(a, b2).sum(1)).astype(np.float32)
        inst_hi[ii] = (t_wfo + np.maximum(a, b2).sum(1)).astype(np.float32)

    cent = 0.5 * (inst_lo + inst_hi)
    inst_okey = np.zeros((8, i_count), np.int32)
    iids = np.arange(i_count, dtype=np.int32)
    for o in range(8):
        sgn = np.array([-1.0 if (o >> 2) & 1 else 1.0,
                        -1.0 if (o >> 1) & 1 else 1.0,
                        -1.0 if o & 1 else 1.0])
        order = np.argsort(cent @ sgn, kind="stable")
        rank = np.empty(i_count, np.int32)
        rank[order] = iids
        inst_okey[o] = (rank << 16) | iids

    return InstAccel(
        blas_lo=jnp.asarray(lo),
        blas_hi=jnp.asarray(hi),
        blas_okey=jnp.asarray(okey.reshape(8 * m_count, cmax, 1)),
        tri_pack=jnp.asarray(pack),
        inst_lo=jnp.asarray(inst_lo),
        inst_hi=jnp.asarray(inst_hi),
        inst_okey=jnp.asarray(inst_okey.reshape(8, i_count, 1)),
        inst=jnp.asarray(inst),
    )


def _split_order(lo: np.ndarray, hi: np.ndarray, cs: int) -> np.ndarray:
    """Recursive longest-axis object-median split -> triangle permutation.

    Like the Morton curve, consecutive `cs`-sized groups of the returned
    order become clusters — but cut points land on cs multiples, so no
    cluster straddles a split plane.  On the rattan chair this gives
    clusters with 2.2x less total AABB surface area than the raw Morton
    cut (the curve snakes between thin woven rods and drags fat boxes
    across them; tools/cluster_sim.py scores both on production ray
    sets), which directly shrinks the per-tile flag unions that set the
    open count at every traversal tier.  Iterative stack, centroid keys.
    """
    centroid = 0.5 * (lo + hi)
    out = []
    stack = [np.arange(len(centroid))]
    while stack:
        idx = stack.pop()
        if len(idx) <= cs:
            out.append(idx)
            continue
        c = centroid[idx]
        ax = int((c.max(0) - c.min(0)).argmax())
        part = idx[np.argsort(c[:, ax], kind="stable")]
        n = len(idx)
        # cut at the cs multiple nearest the median so EVERY cluster
        # boundary of the final concatenated order aligns with a split
        # plane (only the last, partial cluster may be short); integer
        # round-half-up, matching native spt_split_build bit-exactly
        cut = (n + cs) // (2 * cs) * cs
        cut = min(max(cs, cut), (n - 1) // cs * cs)
        stack.append(part[cut:])
        stack.append(part[:cut])
    return np.concatenate(out)


def _cluster_mode() -> str:
    """SPT_CLUSTER picks the build: 'median' (default) or 'morton' (the
    round-1..4.0 build, kept for A/B and as the native-lib path)."""
    import os

    mode = os.environ.get("SPT_CLUSTER", "median")
    return mode if mode in ("median", "morton") else "median"


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
    ns: np.ndarray = None,
) -> MeshAccel:
    """Order triangles spatially (median split, or the Morton curve under
    SPT_CLUSTER=morton) and cut into clusters.

    Prefers the native builder (native/spt_native.cpp, the rtcCommitScene
    role) and falls back to the numpy build.  Both operate on the
    cluster-size-padded soup and produce matching cluster AABBs (padding is
    degenerate and sorts last either way; the native median build may
    distribute exactly-tied centroids differently — a don't-care for the
    min-over-all closest-hit contract).
    """
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    mat = np.asarray(mat, np.int32)
    t = v0.shape[0]
    uv = (np.zeros((t, 6), np.float32) if uv is None
          else np.asarray(uv, np.float32).reshape(t, 6))
    # `ns`: (T, 9) per-triangle shading normals [n0 | n1-n0 | n2-n0], or
    # None for flat shading.  Presence widens tri_pack from 24 to PACK_NS
    # columns — the static pack width IS the kernels' with_ns flag, so
    # normal-less scenes compile the exact 24-column program.
    with_ns = ns is not None
    if with_ns:
        ns = np.asarray(ns, np.float32).reshape(t, 9)

    pad = (-t) % cluster_size
    if pad:
        z = np.zeros((pad, 3), np.float32)
        v0 = np.concatenate([v0, z])
        e1 = np.concatenate([e1, z])
        e2 = np.concatenate([e2, z])
        mat = np.concatenate([mat, np.zeros(pad, np.int32)])
        uv = np.concatenate([uv, np.zeros((pad, 6), np.float32)])
        if with_ns:
            ns = np.concatenate([ns, np.zeros((pad, 9), np.float32)])

    from spt_tpu.io import native

    built = native.cluster_build(v0, e1, e2, cluster_size,
                                 mode=_cluster_mode())
    if built is not None:
        order, cl_lo, cl_hi = built
    else:
        v1 = v0 + e1
        v2 = v0 + e2
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)
        centroid = 0.5 * (lo + hi)
        degenerate = (np.abs(e1).sum(1) == 0) & (np.abs(e2).sum(1) == 0)
        if _cluster_mode() == "median" and (~degenerate).any():
            real = np.nonzero(~degenerate)[0]
            order = np.concatenate(
                [real[_split_order(lo[real], hi[real], cluster_size)],
                 np.nonzero(degenerate)[0]])
        else:
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
    nss = ns[order] if with_ns else None

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
        if with_ns:
            nss = np.concatenate(
                [nss, np.zeros((pad_c * cluster_size, 9), np.float32)])

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

    pack_w = PACK_NS if with_ns else 24
    pack = np.zeros((c_total * cluster_size, pack_w), np.float32)
    pack[:, 0:3] = v0s
    pack[:, 3:6] = e1s
    pack[:, 6:9] = e2s
    pack[:, 9:12] = np.cross(e1s, e2s)  # geometric normal, unnormalized
    pack[:, 12] = mats.astype(np.float32)
    pack[:, 13:19] = uvs                # texture uv0 | duv1 | duv2
    if with_ns:
        pack[:, 19:24] = encode_ns(nss)  # shading n0 | dn1 | dn2, packed
    pack = pack.reshape(c_total, cluster_size, pack_w)

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
        tri_stream[:, :, :pack_w] = pack
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
