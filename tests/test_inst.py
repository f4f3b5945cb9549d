"""Instanced (TLAS/BLAS) traversal vs the flattened reference paths.

The reference's OptiX backend traces an IAS of transformed instances over
per-mesh GAS builds (OptixBackend.cpp:916-1180); here the same scene must
produce the same hits whether it is flattened to world space (the XLA
chunked reference) or traversed through ops/pallas_inst's two-level
structure (interpreter mode on CPU, like tests/test_pallas.py).
"""

import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu.ops import intersect as isect
from spt_tpu.ops.vec3 import Vec3
from spt_tpu.scene import SceneDesc, flatten_scene
from spt_tpu.scene.desc import Material, MeshData

import spt_tpu.ops.pallas_bounce as pb
import spt_tpu.ops.pallas_inst as pinst


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pb.pl, "pallas_call", patched)


def _rot_y(deg):
    a = np.deg2rad(deg)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[2, 2] = np.cos(a)
    m[0, 2] = np.sin(a)
    m[2, 0] = -np.sin(a)
    return m


def _translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (x, y, z)
    return m


def _scale(sx, sy, sz):
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def _soup_mesh(rng, nv=120, nt=200, material_id=0):
    pos = rng.uniform(-1, 1, (nv, 3)).astype(np.float32)
    idx = rng.integers(0, nv, (nt, 3)).astype(np.uint32)
    return MeshData(positions=pos, indices=idx, material_id=material_id)


def _build_instanced(force=True, with_mirror=False, mat_override=None):
    """Three transformed copies of one soup + a second smaller mesh + a
    sphere — exercises multi-mesh BLAS, rotation, nonuniform scale,
    translation (and optionally a mirror and a material override)."""
    rng = np.random.default_rng(11)
    sc = SceneDesc()
    sc.add_material(Material(base_color=[0.8, 0.2, 0.2]))
    sc.add_material(Material(base_color=[0.2, 0.8, 0.2]))
    sc.add_material(Material(base_color=[0.2, 0.2, 0.8]))
    m0 = sc.add_mesh(_soup_mesh(rng, material_id=0))
    m1 = sc.add_mesh(_soup_mesh(rng, nv=60, nt=90, material_id=1))
    sc.add_instance(m0, _translate(-2.0, 0.0, 0.0))
    sc.add_instance(m0, _translate(2.0, 0.5, -1.0) @ _rot_y(35.0)
                    @ _scale(0.7, 1.3, 0.9))
    third = _translate(0.0, -1.5, 1.0) @ _rot_y(-60.0)
    if with_mirror:
        third = third @ _scale(-1.0, 1.0, 1.0)
    if mat_override is not None:
        sc.add_instance(m0, third, material_id=mat_override)
    else:
        sc.add_instance(m0, third)
    sc.add_instance(m1, _translate(0.0, 2.0, -2.0) @ _rot_y(10.0))
    sc.add_sphere([0.0, 0.0, -5.0], 1.0, 2)
    dev = flatten_scene(sc)
    if force and dev.inst is None:
        # small fixtures don't trip the size gate; build the structure
        # directly through the same code path flatten uses
        import spt_tpu.ops.bvh as bvh
        from spt_tpu.scene.flatten import _maybe_build_inst

        orig = bvh.MAX_RESIDENT_TRIS
        try:
            # replicated total just over the gate, unique BLAS just under
            bvh.MAX_RESIDENT_TRIS = dev.num_triangles - 1
            recs = []
            from spt_tpu.scene.desc import NO_MATERIAL

            for inst in sc.instances:
                recs.append((inst.mesh_id, inst.world_from_object,
                             int(inst.material_id)
                             if inst.material_id != NO_MATERIAL else -1))
            ia = _maybe_build_inst(sc, recs, dev.num_triangles, 64)
        finally:
            bvh.MAX_RESIDENT_TRIS = orig
        dev = dev._replace(inst=ia)
    return dev


def _rays(rng, n=512, spread=4.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d)))


class TestInstAccelBuild:
    def test_structure_shapes(self):
        dev = _build_instanced()
        ia = dev.inst
        assert ia is not None
        assert ia.num_meshes == 2
        assert ia.num_instances == 4
        m, cmax = ia.blas_lo.shape[:2]
        assert ia.blas_okey.shape == (8 * m, cmax, 1)
        assert ia.tri_pack.shape[0] == m * cmax
        assert ia.inst.shape == (4, 16)
        # mesh 1 is smaller: its padding clusters must be inverted boxes
        lo1 = np.asarray(ia.blas_lo[1])
        hi1 = np.asarray(ia.blas_hi[1])
        assert (lo1[:, 0] > hi1[:, 0]).any()

    def test_world_aabbs_contain_flattened_geometry(self):
        dev = _build_instanced()
        ia = dev.inst
        v0 = np.asarray(dev.tri_v0)
        e1 = np.asarray(dev.tri_e1)
        e2 = np.asarray(dev.tri_e2)
        degen = (np.abs(e1).sum(1) == 0) & (np.abs(e2).sum(1) == 0)
        pts = np.concatenate([v0[~degen], (v0 + e1)[~degen],
                              (v0 + e2)[~degen]])
        lo = np.asarray(ia.inst_lo).min(0)
        hi = np.asarray(ia.inst_hi).max(0)
        assert (pts >= lo - 1e-3).all() and (pts <= hi + 1e-3).all()

    def test_size_gate(self, monkeypatch):
        # under the gate: no instanced accel
        dev = _build_instanced(force=False)
        assert dev.inst is None
        # over the gate (replicated 690 > budget, unique 512 fits): built
        import spt_tpu.ops.bvh as bvh

        monkeypatch.setattr(bvh, "MAX_RESIDENT_TRIS", 600)
        dev2 = _build_instanced(force=False)
        assert dev2.inst is not None
        # env kill-switch
        monkeypatch.setenv("SPT_INSTANCED", "0")
        dev3 = _build_instanced(force=False)
        assert dev3.inst is None

    def test_all_unique_meshes_decline(self, monkeypatch):
        import spt_tpu.ops.bvh as bvh

        monkeypatch.setattr(bvh, "MAX_RESIDENT_TRIS", 256)
        rng = np.random.default_rng(5)
        sc = SceneDesc()
        sc.add_material(Material())
        for _ in range(4):
            sc.add_instance(sc.add_mesh(_soup_mesh(rng, nv=80, nt=150)))
        dev = flatten_scene(sc)
        # 4 distinct 150-tri meshes: BLAS as big as the soup -> decline
        assert dev.inst is None

    def test_singular_instance_declines(self, monkeypatch):
        import spt_tpu.ops.bvh as bvh

        monkeypatch.setattr(bvh, "MAX_RESIDENT_TRIS", 256)
        rng = np.random.default_rng(5)
        sc = SceneDesc()
        sc.add_material(Material())
        mid = sc.add_mesh(_soup_mesh(rng))
        sc.add_instance(mid)
        sc.add_instance(mid, _scale(1.0, 0.0, 1.0))  # flattened to a plane
        dev = flatten_scene(sc)
        assert dev.inst is None


class TestInstTrace:
    def test_closest_matches_chunked(self):
        dev = _build_instanced()
        ov, dv = _rays(np.random.default_rng(3))
        ref = isect._intersect_chunked(dev, ov, dv,
                                       np.float32(0.0), np.float32(np.inf))
        pal = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_ref, t_pal = np.asarray(ref.t), np.asarray(pal.t)
        both_inf = np.isinf(t_ref) & np.isinf(t_pal)
        # object-space math differs from world-space in float32: allow a
        # relative tolerance and a tiny grazing-ray disagreement fraction
        close = (np.abs(np.nan_to_num(t_ref, nan=1.0, posinf=1e30)
                        - np.nan_to_num(t_pal, nan=2.0, posinf=-1e30))
                 < 1e-3 * np.maximum(np.nan_to_num(t_ref, nan=1.0,
                                                   posinf=1.0), 1.0))
        agree = both_inf | close
        assert agree.mean() > 0.99, f"{(~agree).sum()} lanes disagree"
        hitm = np.isfinite(t_ref) & agree
        assert hitm.sum() > 50, "fixture should produce plenty of hits"
        np.testing.assert_array_equal(
            np.asarray(ref.kind)[hitm], np.asarray(pal.kind)[hitm]
        )
        # materials agree (exercises the BLAS-local material + overrides)
        np.testing.assert_array_equal(
            np.asarray(ref.mat_id)[hitm], np.asarray(pal.mat_id)[hitm]
        )
        # normalized geometric normals agree (inverse-transpose transform)
        nr = np.stack([np.asarray(ref.normal.x), np.asarray(ref.normal.y),
                       np.asarray(ref.normal.z)], -1)[hitm]
        npal = np.stack([np.asarray(pal.normal.x), np.asarray(pal.normal.y),
                         np.asarray(pal.normal.z)], -1)[hitm]
        nr /= np.maximum(np.linalg.norm(nr, axis=1, keepdims=True), 1e-20)
        npal /= np.maximum(np.linalg.norm(npal, axis=1, keepdims=True),
                           1e-20)
        dots = (nr * npal).sum(1)
        assert (dots > 0.999).mean() > 0.99

    def test_mirror_instance_normals(self):
        dev = _build_instanced(with_mirror=True)
        ov, dv = _rays(np.random.default_rng(9))
        ref = isect._intersect_chunked(dev, ov, dv,
                                       np.float32(0.0), np.float32(np.inf))
        pal = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_ref, t_pal = np.asarray(ref.t), np.asarray(pal.t)
        agree = ((np.isinf(t_ref) & np.isinf(t_pal))
                 | (np.abs(np.nan_to_num(t_ref - t_pal, nan=1.0)) < 2e-3))
        assert agree.mean() > 0.99
        hitm = np.isfinite(t_ref) & agree
        nr = np.stack([np.asarray(ref.normal.x), np.asarray(ref.normal.y),
                       np.asarray(ref.normal.z)], -1)[hitm]
        npal = np.stack([np.asarray(pal.normal.x), np.asarray(pal.normal.y),
                         np.asarray(pal.normal.z)], -1)[hitm]
        nr /= np.maximum(np.linalg.norm(nr, axis=1, keepdims=True), 1e-20)
        npal /= np.maximum(np.linalg.norm(npal, axis=1, keepdims=True),
                           1e-20)
        # sign(det) keeps mirrored normals aligned with the flattened cross
        assert ((nr * npal).sum(1) > 0.999).mean() > 0.99

    def test_material_override(self):
        dev = _build_instanced(mat_override=2)
        ia = dev.inst
        assert float(ia.inst[2, 13]) == 2.0
        ov, dv = _rays(np.random.default_rng(3))
        ref = isect._intersect_chunked(dev, ov, dv,
                                       np.float32(0.0), np.float32(np.inf))
        pal = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_ref, t_pal = np.asarray(ref.t), np.asarray(pal.t)
        agree = ((np.isinf(t_ref) & np.isinf(t_pal))
                 | (np.abs(np.nan_to_num(t_ref - t_pal, nan=1.0)) < 2e-3))
        hitm = np.isfinite(t_ref) & agree
        np.testing.assert_array_equal(
            np.asarray(ref.mat_id)[hitm], np.asarray(pal.mat_id)[hitm]
        )
        assert (np.asarray(pal.mat_id)[hitm] == 2).any()

    def test_anyhit_matches_chunked(self):
        dev = _build_instanced()
        ov, dv = _rays(np.random.default_rng(7))
        tmax = np.float32(4.0)
        ref = isect._occluded_chunked(dev, ov, dv, np.float32(1e-4), tmax)
        pal = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        # grazing-ray FP differences may flip an occasional lane
        assert (np.asarray(ref) == np.asarray(pal)).mean() > 0.99


def _build_single_mesh(with_mirror=False, mat_override=None):
    """Four transformed copies of ONE soup + a sphere — the single-mesh
    BLAS shape that routes to the per-lane rounds traversal
    (pallas_inst._rounds_ok)."""
    rng = np.random.default_rng(23)
    sc = SceneDesc()
    sc.add_material(Material(base_color=[0.8, 0.2, 0.2]))
    sc.add_material(Material(base_color=[0.2, 0.8, 0.2]))
    sc.add_material(Material(base_color=[0.2, 0.2, 0.8]))
    m0 = sc.add_mesh(_soup_mesh(rng, material_id=0))
    sc.add_instance(m0, _translate(-2.0, 0.0, 0.0))
    sc.add_instance(m0, _translate(2.0, 0.5, -1.0) @ _rot_y(35.0)
                    @ _scale(0.7, 1.3, 0.9))
    third = _translate(0.0, -1.5, 1.0) @ _rot_y(-60.0)
    if with_mirror:
        third = third @ _scale(-1.0, 1.0, 1.0)
    if mat_override is not None:
        sc.add_instance(m0, third, material_id=mat_override)
    else:
        sc.add_instance(m0, third)
    sc.add_instance(m0, _translate(0.0, 2.0, -2.0) @ _rot_y(10.0))
    sc.add_sphere([0.0, 0.0, -5.0], 1.0, 2)
    dev = flatten_scene(sc)
    if dev.inst is None:
        import spt_tpu.ops.bvh as bvh
        from spt_tpu.scene.desc import NO_MATERIAL
        from spt_tpu.scene.flatten import _maybe_build_inst

        orig = bvh.MAX_RESIDENT_TRIS
        try:
            bvh.MAX_RESIDENT_TRIS = dev.num_triangles - 1
            recs = [(inst.mesh_id, inst.world_from_object,
                     int(inst.material_id)
                     if inst.material_id != NO_MATERIAL else -1)
                    for inst in sc.instances]
            ia = _maybe_build_inst(sc, recs, dev.num_triangles, 64)
        finally:
            bvh.MAX_RESIDENT_TRIS = orig
        dev = dev._replace(inst=ia)
    return dev


class TestInstRounds:
    """Per-lane rounds traversal (single-mesh BLAS, the bigmesh shape):
    parity against the chunked world-space reference AND against the
    per-instance union scheme (SPT_INST_ROUNDS=0)."""

    def test_routes_to_rounds(self):
        dev = _build_single_mesh()
        ia = dev.inst
        assert ia.num_meshes == 1 and ia.num_instances == 4
        refs = (ia.blas_lo, ia.blas_hi, ia.tri_pack, ia.blas_okey,
                ia.inst_lo, ia.inst_hi, ia.inst_okey, ia.inst)
        assert pinst._rounds_ok(refs)

    @pytest.mark.parametrize("with_mirror,mat_override",
                             [(False, None), (True, None), (False, 1)])
    def test_closest_matches_chunked(self, with_mirror, mat_override):
        dev = _build_single_mesh(with_mirror=with_mirror,
                                 mat_override=mat_override)
        ov, dv = _rays(np.random.default_rng(3))
        ref = isect._intersect_chunked(dev, ov, dv,
                                       np.float32(0.0), np.float32(np.inf))
        pal = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_ref, t_pal = np.asarray(ref.t), np.asarray(pal.t)
        agree = ((np.isinf(t_ref) & np.isinf(t_pal))
                 | (np.abs(np.nan_to_num(t_ref - t_pal, nan=1.0)) < 2e-3))
        assert agree.mean() > 0.99, f"{(~agree).sum()} lanes disagree"
        hitm = np.isfinite(t_ref) & agree
        assert hitm.sum() > 50
        np.testing.assert_array_equal(
            np.asarray(ref.mat_id)[hitm], np.asarray(pal.mat_id)[hitm])
        if mat_override is not None:
            assert (np.asarray(pal.mat_id)[hitm] == mat_override).any()
        nr = np.stack([np.asarray(ref.normal.x), np.asarray(ref.normal.y),
                       np.asarray(ref.normal.z)], -1)[hitm]
        npal = np.stack([np.asarray(pal.normal.x), np.asarray(pal.normal.y),
                         np.asarray(pal.normal.z)], -1)[hitm]
        nr /= np.maximum(np.linalg.norm(nr, axis=1, keepdims=True), 1e-20)
        npal /= np.maximum(np.linalg.norm(npal, axis=1, keepdims=True),
                           1e-20)
        assert ((nr * npal).sum(1) > 0.999).mean() > 0.99

    def test_rounds_matches_union(self, monkeypatch):
        """The two instanced traversals are the same arithmetic in a
        different order — they must agree wherever grazing-ray float
        noise doesn't flip a winner."""
        dev = _build_single_mesh()
        ov, dv = _rays(np.random.default_rng(5))
        pal_r = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        monkeypatch.setenv("SPT_INST_ROUNDS", "0")
        pal_u = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_r, t_u = np.asarray(pal_r.t), np.asarray(pal_u.t)
        agree = ((np.isinf(t_r) & np.isinf(t_u))
                 | (np.abs(np.nan_to_num(t_r - t_u, nan=1.0)) < 1e-3))
        assert agree.mean() > 0.995, f"{(~agree).sum()} lanes disagree"
        hitm = np.isfinite(t_r) & agree
        np.testing.assert_array_equal(
            np.asarray(pal_r.mat_id)[hitm], np.asarray(pal_u.mat_id)[hitm])

    def test_anyhit_matches_chunked_and_union(self, monkeypatch):
        dev = _build_single_mesh()
        ov, dv = _rays(np.random.default_rng(7))
        tmax = np.float32(4.0)
        ref = isect._occluded_chunked(dev, ov, dv, np.float32(1e-4), tmax)
        pal_r = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        assert (np.asarray(ref) == np.asarray(pal_r)).mean() > 0.99
        monkeypatch.setenv("SPT_INST_ROUNDS", "0")
        pal_u = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        assert (np.asarray(pal_u) == np.asarray(pal_r)).mean() > 0.995


class TestInstRoundsMultiMesh:
    """Round 5: per-lane rounds over HETEROGENEOUS BLAS tables — the
    reference's actual IAS shape (OptixBackend.cpp:1185-1308).  Each
    round serializes on one mesh id; parity against the union scheme and
    (through TestInstTrace, whose fixture now routes here) against the
    chunked world-space reference."""

    def test_multimesh_routes_to_rounds(self):
        dev = _build_instanced()
        ia = dev.inst
        assert ia.num_meshes == 2 and ia.num_instances == 4
        refs = (ia.blas_lo, ia.blas_hi, ia.tri_pack, ia.blas_okey,
                ia.inst_lo, ia.inst_hi, ia.inst_okey, ia.inst)
        assert pinst._rounds_ok(refs)

    @pytest.mark.parametrize("with_mirror,mat_override",
                             [(False, None), (True, 1)])
    def test_rounds_matches_union(self, monkeypatch, with_mirror,
                                  mat_override):
        dev = _build_instanced(with_mirror=with_mirror,
                               mat_override=mat_override)
        ov, dv = _rays(np.random.default_rng(13))
        pal_r = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        monkeypatch.setenv("SPT_INST_ROUNDS", "0")
        pal_u = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_r, t_u = np.asarray(pal_r.t), np.asarray(pal_u.t)
        agree = ((np.isinf(t_r) & np.isinf(t_u))
                 | (np.abs(np.nan_to_num(t_r - t_u, nan=1.0)) < 1e-3))
        assert agree.mean() > 0.995, f"{(~agree).sum()} lanes disagree"
        hitm = np.isfinite(t_r) & agree
        assert hitm.sum() > 50
        np.testing.assert_array_equal(
            np.asarray(pal_r.mat_id)[hitm], np.asarray(pal_u.mat_id)[hitm])
        np.testing.assert_array_equal(
            np.asarray(pal_r.kind)[hitm], np.asarray(pal_u.kind)[hitm])

    def test_anyhit_matches_union(self, monkeypatch):
        dev = _build_instanced()
        ov, dv = _rays(np.random.default_rng(17))
        tmax = np.float32(4.0)
        pal_r = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        monkeypatch.setenv("SPT_INST_ROUNDS", "0")
        pal_u = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        assert (np.asarray(pal_u) == np.asarray(pal_r)).mean() > 0.995


class TestInstFused:
    def test_fused_matches_staged(self):
        """The fused kernels route 'instanced' scenes through
        pallas_inst's tile functions; fused output must match the staged
        XLA pipeline on the same instanced scene."""
        from spt_tpu.camera import Camera
        from spt_tpu.config import RenderConfig
        from spt_tpu.env import make_procedural_environment
        from spt_tpu.integrators import transport, wavefront as wf
        from spt_tpu.lights import LightManager

        dev = _build_instanced()
        assert pb._accel_mode(dev) == "instanced"

        cfg = RenderConfig(width=32, height=32, spp=1, max_depth=3)
        lm = LightManager()
        lm.add_directional_light((0.2, -0.7, -0.4), (1.0, 1.0, 1.0), 2.0)
        lights = lm.device()
        assert pb.explain_decline(dev, lights, cfg.width * cfg.height,
                                  pad_ok=True) is None
        env = make_procedural_environment()
        cam = Camera(position=(0.0, 0.5, 7.0), target=(0.0, 0.0, 0.0),
                     fov_degrees=55.0,
                     aspect_ratio=1.0).rays()
        ps = transport.gen_primary(cfg, cam, 0)
        got, _ = wf._wavefront_masked(
            cfg, dev, env, lights, ps, jnp.zeros((3,), jnp.int32),
            fused=True)
        ps2 = transport.gen_primary(cfg, cam, 0)
        want, _ = wf._wavefront_masked(
            cfg, dev, env, lights, ps2, jnp.zeros((3,), jnp.int32),
            fused=False)
        w, g = np.asarray(want), np.asarray(got)
        # staged traces the flattened world-space soup, fused the
        # object-space BLAS: identical up to reray float error
        assert np.abs(w - g).max() < 5e-3
        assert (np.abs(w - g).max(-1) > 1e-3).mean() < 0.01


class TestInstHybrid:
    def test_hybrid_bounce0_matches_rounds_only(self, monkeypatch):
        """The runtime union-at-bounce-0 hybrid (round 5) picks a
        different traversal ORDER, not different arithmetic: a fused
        render with the hybrid on must equal one with it off."""
        from spt_tpu.camera import Camera
        from spt_tpu.config import RenderConfig
        from spt_tpu.env import make_procedural_environment
        from spt_tpu.integrators import transport, wavefront as wf
        from spt_tpu.lights import LightManager

        dev = _build_single_mesh()
        assert pb._accel_mode(dev) == "instanced"
        cfg = RenderConfig(width=32, height=32, spp=1, max_depth=3)
        lm = LightManager()
        lm.add_directional_light((0.2, -0.7, -0.4), (1.0, 1.0, 1.0), 2.0)
        lights = lm.device()
        env = make_procedural_environment()
        cam = Camera(position=(0.0, 0.5, 7.0), target=(0.0, 0.0, 0.0),
                     fov_degrees=55.0, aspect_ratio=1.0).rays()

        def render():
            ps = transport.gen_primary(cfg, cam, 0)
            img, _ = wf._wavefront_masked(
                cfg, dev, env, lights, ps, jnp.zeros((3,), jnp.int32),
                fused=True)
            return np.asarray(img)

        got = render()
        monkeypatch.setenv("SPT_INST_HYBRID", "0")
        want = render()
        # same arithmetic either way up to float reordering of the
        # closest-hit carry folds
        assert np.abs(got - want).max() < 5e-3
        assert (np.abs(got - want).max(-1) > 1e-3).mean() < 0.01


class TestInstScenes:
    @pytest.mark.skipif(
        not __import__("os").path.exists(
            "/root/reference/assets/models/rattan_dining_chair/scene.gltf"),
        reason="no chair asset")
    def test_chair_grid_builds_instanced(self):
        """The bigmesh bench scene (4x4 chair grid, ~98k replicated tris)
        gets a TLAS/BLAS pair: one 96-cluster BLAS + 16 transforms instead
        of streaming 98k triangles from HBM."""
        from spt_tpu.scene import build_chair_grid_scene

        desc, _, _ = build_chair_grid_scene()
        dev = flatten_scene(desc)
        ia = dev.inst
        assert ia is not None
        assert ia.num_meshes == 1
        assert ia.num_instances == 16
        assert ia.cmax * ia.cluster_size <= 12288  # BLAS fits residency
        assert pb._accel_mode(dev) == "instanced"
        # the grid is a translation lattice: every R_ofw equals instance
        # 0's, translations differ
        tab = np.asarray(ia.inst)
        assert np.abs(tab[:, 0:9] - tab[0, 0:9]).max() < 1e-4
        assert len({tuple(row) for row in tab[:, 9:12].round(4)}) == 16

    def test_sharded_instanced_matches_single(self):
        """An instanced scene on the 8-device mesh: the TLAS/BLAS pytree
        replicates with the scene, and the sharded render matches
        single-chip (CPU mesh runs the XLA fallback; the point is the
        pytree plumbing end-to-end)."""
        from spt_tpu.camera import Camera
        from spt_tpu.config import RenderConfig
        from spt_tpu.engine.renderer import Renderer

        dev_probe = _build_instanced()  # ensures fixture instancing works
        assert dev_probe.inst is not None

        import spt_tpu.ops.bvh as bvh

        orig = bvh.MAX_RESIDENT_TRIS
        rng = np.random.default_rng(11)
        sc = SceneDesc()
        sc.add_material(Material(base_color=(0.7, 0.5, 0.3)))
        mid = sc.add_mesh(_soup_mesh(rng, nv=200, nt=400))
        sc.add_instance(mid, _translate(-1.2, 0.0, 0.0))
        sc.add_instance(mid, _translate(1.2, 0.3, -0.5) @ _rot_y(40.0))
        cfg = RenderConfig(width=32, height=32, spp=1, max_depth=3)
        cam = Camera(position=(0, 0, 5.0), target=(0, 0, 0),
                     fov_degrees=50.0, aspect_ratio=1.0)
        try:
            bvh.MAX_RESIDENT_TRIS = 700  # 800 replicated > 700 > 448 unique
            r8 = Renderer(sc, cfg, camera=cam)
            assert r8.mesh is not None
            assert r8.scene.inst is not None
            r8.render_frame(check_camera=False)
            r1 = Renderer(sc, cfg, camera=cam, multi_device=False)
            r1.render_frame(check_camera=False)
        finally:
            bvh.MAX_RESIDENT_TRIS = orig
        np.testing.assert_allclose(r8.image(), r1.image(),
                                   rtol=1e-3, atol=2e-3)


class TestInstGateErrors:
    def test_overflow_instance_count_is_valueerror(self):
        """>16384 instances must raise ValueError (which _maybe_build_inst
        catches to decline to the streamed tier), not a bare assert that
        crashes flatten_scene (round-4 review finding)."""
        from spt_tpu.ops.bvh import build_inst_accel

        v0 = np.zeros((4, 3), np.float32)
        v0[:, 0] = np.arange(4)
        e1 = np.tile(np.array([[0.5, 0, 0]], np.float32), (4, 1))
        e2 = np.tile(np.array([[0, 0.5, 0]], np.float32), (4, 1))
        mesh = (v0, e1, e2, np.zeros(4, np.int32), None)
        eye = np.eye(4, dtype=np.float32)
        instances = [(0, eye, -1)] * ((1 << 14) + 1)
        with pytest.raises(ValueError, match="overflow"):
            build_inst_accel([mesh], instances)


class TestInstTextured:
    def test_textured_instanced_fused_matches_staged(self):
        """The bigmesh chair is textured: the fused instanced path must
        resolve texture uv through the BLAS pack exactly like the staged
        pipeline resolves it through the replicated accel."""
        from spt_tpu.camera import Camera
        from spt_tpu.config import RenderConfig
        from spt_tpu.env import make_procedural_environment
        from spt_tpu.integrators import transport, wavefront as wf
        from spt_tpu.lights import LightManager

        rng = np.random.default_rng(5)
        tex = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        sc = SceneDesc()
        sc.add_material(Material(base_color=[1.0, 1.0, 1.0], roughness=1.0,
                                 ior=1.0, base_color_texture=tex))
        quad = MeshData(
            positions=[[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
            indices=[[0, 1, 2], [0, 2, 3]],
            normals=[[0, 0, 1]] * 4,
            texcoords=[[0, 1], [1, 1], [1, 0], [0, 0]],
            material_id=0,
        )
        # pad the mesh with a soup so the prim count clears
        # MAX_PALLAS_PRIMS and accel mode engages
        soup = _soup_mesh(rng, nv=100, nt=240, material_id=0)
        mid_q = sc.add_mesh(quad)
        mid_s = sc.add_mesh(soup)
        sc.add_instance(mid_q, _translate(-1.5, 0.0, 0.0))
        sc.add_instance(mid_q, _translate(1.5, 0.3, -0.5) @ _rot_y(30.0))
        # three soup copies: the uniform-CMAX BLAS padding (the tiny quad
        # pads to the soup's cluster count) must stay under the replicated
        # total for the size gate to accept
        sc.add_instance(mid_s, _translate(0.0, -2.5, 0.0))
        sc.add_instance(mid_s, _translate(0.0, 2.5, 0.0))
        sc.add_instance(mid_s, _translate(2.5, 0.0, 1.0) @ _rot_y(75.0))
        dev = flatten_scene(sc)
        assert dev.textures is not None
        import spt_tpu.ops.bvh as bvh
        from spt_tpu.scene.flatten import _maybe_build_inst
        from spt_tpu.scene.desc import NO_MATERIAL

        orig = bvh.MAX_RESIDENT_TRIS
        try:
            bvh.MAX_RESIDENT_TRIS = dev.num_triangles - 1
            recs = [(i.mesh_id, i.world_from_object,
                     int(i.material_id) if i.material_id != NO_MATERIAL
                     else -1) for i in sc.instances]
            dev = dev._replace(inst=_maybe_build_inst(
                sc, recs, dev.num_triangles, 64))
        finally:
            bvh.MAX_RESIDENT_TRIS = orig
        assert dev.inst is not None
        assert pb._accel_mode(dev) == "instanced"

        cfg = RenderConfig(width=32, height=32, spp=1, max_depth=2)
        lm = LightManager()
        lm.add_directional_light((0.1, -0.3, -1.0), (1.0, 1.0, 1.0), 2.0)
        lights = lm.device()
        env = make_procedural_environment()
        cam = Camera(position=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0),
                     fov_degrees=55.0, aspect_ratio=1.0).rays()
        ps = transport.gen_primary(cfg, cam, 0)
        got, _ = wf._wavefront_masked(
            cfg, dev, env, lights, ps, jnp.zeros((3,), jnp.int32),
            fused=True)
        ps2 = transport.gen_primary(cfg, cam, 0)
        want, _ = wf._wavefront_masked(
            cfg, dev, env, lights, ps2, jnp.zeros((3,), jnp.int32),
            fused=False)
        w, g = np.asarray(want), np.asarray(got)
        assert np.abs(w - g).max() < 5e-3
        assert (np.abs(w - g).max(-1) > 1e-3).mean() < 0.01


class TestInstRecheck:
    """SPT_INST_RECHECK=1: the mid-round per-open bound recheck must be
    radiometrically invisible — a cluster whose slab interval is empty
    under the CURRENT per-lane bound cannot contain an improving hit."""

    def test_closest_matches_no_recheck(self, monkeypatch):
        dev = _build_single_mesh(with_mirror=True)
        ov, dv = _rays(np.random.default_rng(11))
        base = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        monkeypatch.setenv("SPT_INST_RECHECK", "1")
        rech = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        t_b, t_r = np.asarray(base.t), np.asarray(rech.t)
        agree = ((np.isinf(t_b) & np.isinf(t_r))
                 | (np.abs(np.nan_to_num(t_b - t_r, nan=1.0)) < 1e-5))
        assert agree.all(), f"{(~agree).sum()} lanes disagree"
        hitm = np.isfinite(t_b)
        np.testing.assert_array_equal(
            np.asarray(base.mat_id)[hitm], np.asarray(rech.mat_id)[hitm])
        for ax in ("x", "y", "z"):
            np.testing.assert_allclose(
                np.asarray(getattr(base.normal, ax))[hitm],
                np.asarray(getattr(rech.normal, ax))[hitm], atol=1e-6)


class TestInstReflag:
    """SPT_INST_REFLAG: the mid-round vectorized re-cull of the remaining
    cluster visit list must be bit-identical to the reflag-off loop —
    containment: a cluster whose box misses every lane's tightened
    [tmin, best_t] interval cannot hold a strictly closer hit, and a
    blocked lane cannot become unblocked."""

    @pytest.mark.parametrize("n_reflag", ["1", "3"])
    def test_closest_and_any_match_off(self, monkeypatch, n_reflag):
        dev = _build_single_mesh(with_mirror=True)
        ov, dv = _rays(np.random.default_rng(17))
        tmax = np.float32(6.0)
        monkeypatch.setenv("SPT_INST_REFLAG", "0")
        base = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        basea = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        monkeypatch.setenv("SPT_INST_REFLAG", n_reflag)
        ref = pinst.closest_hit(dev.inst, dev, ov, dv, tmin=0.0)
        refa = pinst.any_hit(dev.inst, dev, ov, dv, tmin=1e-4, tmax=tmax)
        np.testing.assert_array_equal(np.asarray(base.t), np.asarray(ref.t))
        np.testing.assert_array_equal(np.asarray(base.kind),
                                      np.asarray(ref.kind))
        np.testing.assert_array_equal(np.asarray(base.mat_id),
                                      np.asarray(ref.mat_id))
        for ax in ("x", "y", "z"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base.normal, ax)),
                np.asarray(getattr(ref.normal, ax)))
        np.testing.assert_array_equal(np.asarray(basea), np.asarray(refa))


class TestInstOracle:
    """End-to-end radiometric ground truth for the instanced tier: the
    fused per-lane rounds pipeline (the bigmesh production shape) must
    match the scalar numpy oracle, which traces the SAME scene through its
    flattened world-space triangle soup — the two implementations share no
    traversal code, so this closes the loop the per-component parity
    tests (vs the chunked XLA reference) only cover transitively."""

    def test_instanced_render_matches_oracle(self):
        import tests.reference_cpu as ref
        from spt_tpu.camera import Camera
        from spt_tpu.config import RenderConfig
        from spt_tpu.env import make_procedural_environment
        from spt_tpu.integrators import transport, wavefront as wf
        from spt_tpu.lights import LightManager

        dev = _build_single_mesh()
        assert pb._accel_mode(dev) == "instanced"
        # single-mesh BLAS + several instances: the rounds-eligible shape
        assert dev.inst.blas_lo.shape[0] == 1 and dev.inst.inst.shape[0] > 1

        cfg = RenderConfig(width=32, height=24, spp=1, max_depth=3,
                           swizzle=False)
        lm = LightManager()
        lm.add_directional_light((0.2, -0.6, -1.0), (1.0, 0.95, 0.9), 2.0)
        lights = lm.device()
        env = make_procedural_environment()
        cam = Camera(position=(0.0, 0.5, 7.0), target=(0.0, 0.0, 0.0),
                     fov_degrees=55.0, aspect_ratio=cfg.width / cfg.height)
        ps = transport.gen_primary(cfg, cam.rays(), 0)
        got, _ = wf._wavefront_masked(
            cfg, dev, env, lights, ps, jnp.zeros((3,), jnp.int32),
            fused=True)
        img = np.asarray(got).reshape(cfg.height, cfg.width, 3)

        nps = ref.NpScene(dev)
        lref = ref.lights_from_device(lights)
        want = ref.render_image(cfg, nps, lref, cam, frame=0)
        err = float(np.sqrt(np.mean((img - want) ** 2)))
        scale = float(np.sqrt(np.mean(want ** 2))) + 1e-9
        assert err / scale < 0.01, f"relative RMSE {err/scale:.4f}"
