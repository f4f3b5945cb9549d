"""Intersection kernels vs known answers and the scalar oracle."""

import jax.numpy as jnp
import numpy as np

from spt_tpu.ops import intersect as isect
from spt_tpu.scene import SceneDesc, build_default_scene, flatten_scene
from spt_tpu.scene.desc import Material, MeshData

import reference_cpu as ref


def _single_tri_scene():
    sc = SceneDesc()
    sc.add_material(Material())
    mesh = MeshData(
        positions=np.array([[-1, -1, -2], [1, -1, -2], [0, 1, -2]], np.float32),
        indices=np.array([[0, 1, 2]], np.uint32),
    )
    mid = sc.add_mesh(mesh)
    sc.add_instance(mid)
    return flatten_scene(sc)


class TestKnownAnswers:
    def test_triangle_hit_and_miss(self):
        dev = _single_tri_scene()
        o = jnp.array([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        hit = isect.intersect(dev, o, d, tmin=0.0)
        t = np.asarray(hit.t)
        np.testing.assert_allclose(t[0], 2.0, atol=1e-6)
        assert np.isinf(t[1])
        assert int(hit.kind[0]) == isect.KIND_TRIANGLE
        n = np.asarray(hit.normal[0])
        n = n / np.linalg.norm(n)
        np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-6)

    def test_sphere_hit(self):
        sc = SceneDesc()
        sc.add_material(Material())
        sc.add_sphere([0.0, 0.0, -5.0], 2.0, 0)
        dev = flatten_scene(sc)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = isect.intersect(dev, o, d, tmin=0.0)
        np.testing.assert_allclose(float(hit.t[0]), 3.0, atol=1e-5)
        assert int(hit.kind[0]) == isect.KIND_SPHERE
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5)

    def test_sphere_inside_hit(self):
        sc = SceneDesc()
        sc.add_material(Material())
        sc.add_sphere([0.0, 0.0, 0.0], 2.0, 0)
        dev = flatten_scene(sc)
        hit = isect.intersect(
            dev, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, -1.0]]), tmin=0.0
        )
        np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)

    def test_tmin_tmax_window(self):
        sc = SceneDesc()
        sc.add_material(Material())
        sc.add_sphere([0.0, 0.0, -5.0], 1.0, 0)
        dev = flatten_scene(sc)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        assert not bool(isect.intersect(dev, o, d, tmin=0.0, tmax=3.0).hit_mask[0])
        assert bool(isect.intersect(dev, o, d, tmin=0.0, tmax=4.5).hit_mask[0])
        # tmin beyond both roots -> miss
        assert not bool(isect.intersect(dev, o, d, tmin=7.0).hit_mask[0])

    def test_closest_of_two(self):
        sc = SceneDesc()
        sc.add_material(Material())
        sc.add_material(Material())
        sc.add_sphere([0.0, 0.0, -5.0], 1.0, 0)
        sc.add_sphere([0.0, 0.0, -3.0], 1.0, 1)
        dev = flatten_scene(sc)
        hit = isect.intersect(
            dev, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, -1.0]]), tmin=0.0
        )
        np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)
        assert int(hit.mat_id[0]) == 1

    def test_occluded(self):
        dev = _single_tri_scene()
        o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        blocked = np.asarray(isect.occluded(dev, o, d, tmin=0.0))
        np.testing.assert_array_equal(blocked, [True, False])

    def test_occluded_respects_tmax(self):
        dev = _single_tri_scene()
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        assert not bool(isect.occluded(dev, o, d, tmin=0.0, tmax=jnp.array([1.5]))[0])

    def test_safe_origin_scale_aware(self):
        p = jnp.array([[0.0, 0.0, 0.0], [1000.0, 0.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
        o = np.asarray(isect.safe_origin(p, n, jnp.array([True, True])))
        np.testing.assert_allclose(o[0, 1], 1e-4, rtol=1e-5)
        np.testing.assert_allclose(o[1, 1], 1e-1, rtol=1e-5)


class TestVsOracle:
    def test_random_rays_match_scalar_oracle(self, rng):
        dev = flatten_scene(build_default_scene())
        nps = ref.NpScene(dev)
        n = 256
        o = rng.uniform(-6, 8, size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        hit = isect.intersect(dev, jnp.asarray(o), jnp.asarray(d), tmin=0.0)
        t = np.asarray(hit.t)
        mat = np.asarray(hit.mat_id)
        kind = np.asarray(hit.kind)
        for i in range(n):
            rt, _, rmat, rkind = ref.intersect(nps, o[i], d[i], tmin=0.0)
            if np.isinf(rt):
                assert np.isinf(t[i]), f"ray {i}: oracle miss, got t={t[i]}"
            else:
                np.testing.assert_allclose(t[i], rt, rtol=1e-4, atol=1e-5)
                assert kind[i] == rkind and mat[i] == rmat, f"ray {i}"

    def test_occluded_matches_intersect(self, rng):
        dev = flatten_scene(build_default_scene())
        n = 512
        o = rng.uniform(-6, 8, size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        hit = isect.intersect(dev, jnp.asarray(o), jnp.asarray(d), tmin=1e-4)
        blocked = isect.occluded(dev, jnp.asarray(o), jnp.asarray(d), tmin=1e-4)
        np.testing.assert_array_equal(np.asarray(blocked), np.asarray(hit.hit_mask))
