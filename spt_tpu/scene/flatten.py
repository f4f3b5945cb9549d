"""SceneDesc -> DeviceScene: the TPU analog of the backend build step.

The reference's EmbreeBackend flattens instances by pre-transforming triangle
geometry into world space (positions by worldFromObject, normals by
inverse-transpose; EmbreeBackend.cpp:60-79) and registers analytic spheres as
user geometry (:139-178), maintaining a geomID->materialId map (:129-174).

Here the flattening produces dense SoA arrays with static shapes.  Padding
is OFF by default — the unrolled/streamed intersectors iterate exact prim
counts, and each padded prim would be a 100%-wasted full-width test (25% of
the default scene!).  When padding is requested (pad_multiple > 1, or the
cluster accel's internal padding), padded triangles are degenerate (zero
area -> Möller-Trumbore determinant 0, never hit) and padded spheres have
radius 0 (discriminant < 0 for any ray not through the center).
Material resolution order matches EmbreeBackend.cpp:51-57: instance override,
then mesh material, then 0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from spt_tpu.materials import DeviceMaterials, build_device_materials
from spt_tpu.scene.desc import NO_MATERIAL, SceneDesc

# Above this many primitives a mesh acceleration structure is built
# (matches ops.intersect.UNROLL_LIMIT, where the streaming intersector
# stops unrolling).
ACCEL_THRESHOLD = 192


class EmitterTable(NamedTuple):
    """Emissive-triangle table for next-event estimation (area lights).

    The reference supports emissive materials but never samples them — its
    planned shadow-ray wavefront (wf_types.h:51-63 ShadowTask) only covered
    analytic lights.  Sampling emitters directly is the standard fix for
    emissive-scene variance (the Cornell-box benchmark, BASELINE.md #2).
    """

    v0: jnp.ndarray    # (E, 3)
    e1: jnp.ndarray    # (E, 3)
    e2: jnp.ndarray    # (E, 3)
    le: jnp.ndarray    # (E, 3) emitted radiance
    area: jnp.ndarray  # (E,)

    @property
    def count(self) -> int:
        return self.v0.shape[0]


class DeviceScene(NamedTuple):
    """World-space scene as SoA device arrays. A pytree — passes straight
    through jit/shard_map; replicate per chip for image-space DP
    (SURVEY.md §2 parallelism table)."""

    tri_v0: jnp.ndarray       # (T, 3) float32
    tri_e1: jnp.ndarray       # (T, 3) v1 - v0 (precomputed MT edges)
    tri_e2: jnp.ndarray       # (T, 3) v2 - v0
    tri_mat: jnp.ndarray      # (T,) int32
    sph_center: jnp.ndarray   # (S, 3) float32
    sph_radius: jnp.ndarray   # (S,) float32 (0 for padding)
    sph_mat: jnp.ndarray      # (S,) int32
    materials: DeviceMaterials
    # Morton-cluster acceleration for large meshes (ops/bvh.py); None for
    # scenes small enough to stream-unroll.
    accel: Optional["MeshAccel"] = None
    # Emissive triangles for NEE; None when the scene has no emitters.
    emitters: Optional[EmitterTable] = None
    # Per-triangle texture coordinates [uv0 | uv1-uv0 | uv2-uv0], (T, 6)
    # float32; None when no material carries a texture (the common case —
    # keeps untextured programs free of the extra tables).
    tri_uv: Optional[jnp.ndarray] = None
    # Scene texture table (n_tex, 4, 8, 128, 3) float32 linear color — the
    # kernel-addressable tiling of TEX_RES^2 baseColor images
    # (materials.build_texture_table); None when untextured.
    textures: Optional[jnp.ndarray] = None
    # Two-level instanced acceleration (ops/bvh.InstAccel) — built when the
    # flattened scene exceeds the resident tracer but the UNIQUE geometry
    # fits (the reference's IAS-over-GAS shape, OptixBackend.cpp:916-1180).
    # The flat world-space arrays above stay authoritative for the XLA
    # fallback and the CPU oracle; this is the fast path's view.
    inst: Optional["InstAccel"] = None
    # Per-triangle WORLD-space shading normals [n0 | n1-n0 | n2-n0],
    # (T, 9) float32 — vertex NORMALs transformed by the instance
    # inverse-transpose (EmbreeBackend.cpp:60-79's fidelity, which the
    # reference's backends then drop by shading with Ng); interpolated at
    # the hit by every intersector.  None when no mesh carries normals;
    # meshes without normals contribute zero rows (geometric fallback).
    tri_ns: Optional[jnp.ndarray] = None

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sph_center.shape[0]


def _resolve_material(instance, mesh) -> int:
    mid = instance.material_id
    if mid == NO_MATERIAL:
        mid = mesh.material_id
    if mid == NO_MATERIAL:
        mid = 0
    return int(mid)


def _pad_to(n: int, multiple: int) -> int:
    if n == 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


def flatten_scene(desc: SceneDesc, pad_multiple: int = 1,
                  cluster_size: int = 64) -> DeviceScene:
    """Bake instance transforms and build the padded SoA arrays (plus the
    cluster accel for large meshes — the rtcCommitScene/optixAccelBuild
    analog, EmbreeBackend.cpp:181 / OptixBackend.cpp:916-1180)."""
    v0s, v1s, v2s, tri_mats, tri_uvs, tri_nss = [], [], [], [], [], []
    has_ns = False
    inst_records = []  # (mesh_id, world_from_object, mat_override) per VALID instance
    for inst in desc.instances:
        if inst.mesh_id >= len(desc.meshes):
            continue
        mesh = desc.meshes[inst.mesh_id]
        if not mesh.is_valid():
            continue
        inst_records.append((
            inst.mesh_id, inst.world_from_object,
            int(inst.material_id) if inst.material_id != NO_MATERIAL else -1,
        ))
        mat_id = _resolve_material(inst, mesh)
        # positions -> world (EmbreeBackend.cpp:63-69)
        xf = inst.world_from_object
        pos_h = np.concatenate(
            [mesh.positions, np.ones((mesh.vertex_count, 1), np.float32)], axis=1
        )
        world = (pos_h @ xf.T)[:, :3].astype(np.float32)
        idx = mesh.indices.astype(np.int64)
        v0s.append(world[idx[:, 0]])
        v1s.append(world[idx[:, 1]])
        v2s.append(world[idx[:, 2]])
        tri_mats.append(np.full(idx.shape[0], mat_id, np.int32))
        if mesh.texcoords is not None and len(mesh.texcoords) == mesh.vertex_count:
            tc = mesh.texcoords
            uv0 = tc[idx[:, 0]]
            tri_uvs.append(np.concatenate(
                [uv0, tc[idx[:, 1]] - uv0, tc[idx[:, 2]] - uv0], axis=1
            ).astype(np.float32))
        else:
            tri_uvs.append(np.zeros((idx.shape[0], 6), np.float32))
        if mesh.normals is not None and len(mesh.normals) == mesh.vertex_count:
            # normals -> world by the inverse-transpose
            # (EmbreeBackend.cpp:70-79); row-vector form n_w = n_o @ R_ofw
            ofw = np.linalg.inv(np.asarray(xf, np.float64))[:3, :3]
            nw = (mesh.normals.astype(np.float64) @ ofw)
            nw /= np.maximum(np.linalg.norm(nw, axis=1, keepdims=True),
                             1e-20)
            nw = nw.astype(np.float32)
            n0 = nw[idx[:, 0]]
            tri_nss.append(np.concatenate(
                [n0, nw[idx[:, 1]] - n0, nw[idx[:, 2]] - n0], axis=1))
            has_ns = True
        else:
            tri_nss.append(np.zeros((idx.shape[0], 9), np.float32))

    if v0s:
        v0 = np.concatenate(v0s)
        v1 = np.concatenate(v1s)
        v2 = np.concatenate(v2s)
        tri_mat = np.concatenate(tri_mats)
        tri_uv = np.concatenate(tri_uvs)
        tri_ns = np.concatenate(tri_nss)
    else:
        v0 = np.zeros((0, 3), np.float32)
        v1 = np.zeros((0, 3), np.float32)
        v2 = np.zeros((0, 3), np.float32)
        tri_mat = np.zeros((0,), np.int32)
        tri_uv = np.zeros((0, 6), np.float32)
        tri_ns = np.zeros((0, 9), np.float32)

    if has_ns:
        # SPT_NS=0 drops shading normals entirely (flat shading, the
        # reference backends' behavior) — the quality/speed knob and the
        # A/B that prices the interpolation: the wider 28-col pack adds
        # pick() passes at every winner resolution.
        import os

        has_ns = os.environ.get("SPT_NS", "1") != "0"
    if has_ns and v0.shape[0]:
        # Drop the table when interpolation is everywhere the geometric
        # normal anyway (flat meshes like the ground plane, whose vertex
        # normals are constant and aligned with the winding): those scenes
        # keep the exact normal-less programs — the default/cornell hot
        # paths pay nothing for this feature.
        ng = np.cross(v1 - v0, v2 - v0)
        ngl = np.linalg.norm(ng, axis=1, keepdims=True)
        real = ngl[:, 0] > 1e-20
        ngn = ng / np.maximum(ngl, 1e-20)
        varying = np.abs(tri_ns[:, 3:9]).max(axis=1) > 1e-6
        nonzero = np.abs(tri_ns[:, 0:3]).max(axis=1) > 1e-12
        off_geom = np.abs(tri_ns[:, 0:3] - ngn).max(axis=1) > 1e-3
        has_ns = bool((real & nonzero & (varying | off_geom)).any())
    if has_ns:
        # Store the 12-bit-quantized values every kernel path shades with
        # (bvh.encode_ns packs these into tri_pack cols 19-23), so the XLA
        # trace paths and the CPU oracle agree with the Pallas kernels
        # bit-for-bit.
        from spt_tpu.ops.bvh import quantize_ns

        tri_ns = quantize_ns(tri_ns)

    t_pad = _pad_to(v0.shape[0], pad_multiple)
    pad_n = t_pad - v0.shape[0]
    if pad_n:
        zero = np.zeros((pad_n, 3), np.float32)
        v0 = np.concatenate([v0, zero])
        v1 = np.concatenate([v1, zero])
        v2 = np.concatenate([v2, zero])
        tri_mat = np.concatenate([tri_mat, np.zeros(pad_n, np.int32)])
        tri_uv = np.concatenate([tri_uv, np.zeros((pad_n, 6), np.float32)])
        tri_ns = np.concatenate([tri_ns, np.zeros((pad_n, 9), np.float32)])

    if desc.spheres:
        centers = np.stack([s.center for s in desc.spheres]).astype(np.float32)
        radii = np.array([s.radius for s in desc.spheres], np.float32)
        sph_mat = np.array([s.material_id for s in desc.spheres], np.int32)
    else:
        centers = np.zeros((0, 3), np.float32)
        radii = np.zeros((0,), np.float32)
        sph_mat = np.zeros((0,), np.int32)

    s_pad = _pad_to(centers.shape[0], pad_multiple)
    pad_n = s_pad - centers.shape[0]
    if pad_n:
        centers = np.concatenate([centers, np.zeros((pad_n, 3), np.float32)])
        radii = np.concatenate([radii, np.zeros(pad_n, np.float32)])
        sph_mat = np.concatenate([sph_mat, np.zeros(pad_n, np.int32)])

    # Emitter table: triangles whose material emits.
    emitters = None
    if len(desc.materials) and v0.shape[0]:
        em = np.stack([m.emission for m in desc.materials]).astype(np.float32)
        emissive_mat = (em.max(axis=1) > 0.0)
        tm_clip = np.clip(tri_mat, 0, len(desc.materials) - 1)
        sel = emissive_mat[tm_clip]
        # padded tris have mat 0; exclude degenerates
        degen = (np.abs(v1 - v0).sum(1) == 0) & (np.abs(v2 - v0).sum(1) == 0)
        sel = sel & ~degen
        if sel.any():
            ev0, ee1, ee2 = v0[sel], (v1 - v0)[sel], (v2 - v0)[sel]
            area = 0.5 * np.linalg.norm(np.cross(ee1, ee2), axis=1)
            emitters = EmitterTable(
                v0=jnp.asarray(ev0),
                e1=jnp.asarray(ee1),
                e2=jnp.asarray(ee2),
                le=jnp.asarray(em[tm_clip[sel]]),
                area=jnp.asarray(area.astype(np.float32)),
            )

    accel = None
    if v0.shape[0] > ACCEL_THRESHOLD:
        import os

        from spt_tpu.ops.bvh import build_mesh_accel

        cluster_size = int(os.environ.get("SPT_CLUSTER_SIZE", cluster_size))
        accel = build_mesh_accel(v0, v1 - v0, v2 - v0, tri_mat,
                                 cluster_size=cluster_size, uv=tri_uv,
                                 ns=tri_ns if has_ns else None)
    inst_accel = _maybe_build_inst(desc, inst_records, v0.shape[0],
                                   cluster_size)

    from spt_tpu.materials import build_texture_table

    _, textures = build_texture_table(desc.materials)
    return DeviceScene(
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(v1 - v0),
        tri_e2=jnp.asarray(v2 - v0),
        tri_mat=jnp.asarray(tri_mat),
        sph_center=jnp.asarray(centers),
        sph_radius=jnp.asarray(radii),
        sph_mat=jnp.asarray(sph_mat),
        materials=build_device_materials(desc.materials),
        accel=accel,
        emitters=emitters,
        tri_uv=jnp.asarray(tri_uv) if textures is not None else None,
        textures=textures,
        inst=inst_accel,
        tri_ns=jnp.asarray(tri_ns) if has_ns else None,
    )


def _maybe_build_inst(desc: SceneDesc, inst_records, total_tris: int,
                      cluster_size: int):
    """Build the TLAS/BLAS instanced accel when it wins: the flattened
    scene exceeds the resident tracer's budget, but the UNIQUE meshes —
    each cluster-padded to the largest mesh's padded count — fit it.  A
    scene of all-distinct meshes declines naturally (its BLAS is as big as
    the flattened soup).  SPT_INSTANCED=0 forces the streamed flattened
    path (the A/B for benchmarks)."""
    import os

    if os.environ.get("SPT_INSTANCED", "1") == "0":
        return None
    from spt_tpu.ops.bvh import MAX_RESIDENT_TRIS, build_inst_accel

    if total_tris <= MAX_RESIDENT_TRIS or len(inst_records) < 2:
        return None
    mesh_ids = sorted({mid for mid, _, _ in inst_records})
    local = {mid: i for i, mid in enumerate(mesh_ids)}

    cmax = max(-(-desc.meshes[mid].triangle_count // cluster_size)
               for mid in mesh_ids)
    if len(mesh_ids) * cmax * cluster_size > MAX_RESIDENT_TRIS:
        return None

    meshes = []
    for mid in mesh_ids:
        mesh = desc.meshes[mid]
        pos = mesh.positions
        idx = mesh.indices.astype(np.int64)
        mv0 = pos[idx[:, 0]].astype(np.float32)
        e1 = (pos[idx[:, 1]] - pos[idx[:, 0]]).astype(np.float32)
        e2 = (pos[idx[:, 2]] - pos[idx[:, 0]]).astype(np.float32)
        blas_mat = mesh.material_id if mesh.material_id != NO_MATERIAL else 0
        mat = np.full(idx.shape[0], blas_mat, np.int32)
        if mesh.texcoords is not None and len(mesh.texcoords) == mesh.vertex_count:
            tc = mesh.texcoords
            uv0 = tc[idx[:, 0]]
            uv = np.concatenate(
                [uv0, tc[idx[:, 1]] - uv0, tc[idx[:, 2]] - uv0], axis=1
            ).astype(np.float32)
        else:
            uv = None
        import os as _os
        if (mesh.normals is not None
                and len(mesh.normals) == mesh.vertex_count
                and _os.environ.get("SPT_NS", "1") != "0"):
            # OBJECT-space shading normals; the traversal's finish hook
            # applies the per-instance inverse-transpose (no sign(det) —
            # pallas_inst._make_finish)
            nrm = mesh.normals.astype(np.float64)
            nrm = nrm / np.maximum(
                np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
            nrm = nrm.astype(np.float32)
            n0 = nrm[idx[:, 0]]
            ns = np.concatenate(
                [n0, nrm[idx[:, 1]] - n0, nrm[idx[:, 2]] - n0], axis=1)
            # same triviality drop as the flat path: a mesh whose vertex
            # normals are everywhere the winding normal packs flat
            ng = np.cross(e1, e2)
            ngl = np.linalg.norm(ng, axis=1, keepdims=True)
            real = ngl[:, 0] > 1e-20
            ngn = ng / np.maximum(ngl, 1e-20)
            varying = np.abs(ns[:, 3:9]).max(axis=1) > 1e-6
            off = np.abs(ns[:, 0:3] - ngn).max(axis=1) > 1e-3
            if not (real & (varying | off)).any():
                ns = None
        else:
            ns = None
        meshes.append((mv0, e1, e2, mat, uv, ns))

    instances = [(local[mid], xf, mat_ov)
                 for mid, xf, mat_ov in inst_records]
    try:
        return build_inst_accel(meshes, instances,
                                cluster_size=cluster_size)
    except ValueError:
        # singular instance transform (only the flattened path renders it)
        # or an instance count past the visit-key packing: decline to the
        # streamed flattened tier
        return None
