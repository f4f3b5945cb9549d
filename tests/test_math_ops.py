"""Unit tests: math3d, rng, sampling, tonemap."""

import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu.ops import math3d as m3
from spt_tpu.ops import rng as rng_ops
from spt_tpu.ops import sampling
from spt_tpu.ops import tonemap


class TestMath3d:
    def test_normalize(self, rng):
        v = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        n = m3.safe_normalize(v)
        np.testing.assert_allclose(np.asarray(m3.length(n)), 1.0, atol=1e-5)

    def test_normalize_zero(self):
        z = m3.safe_normalize(jnp.zeros((4, 3)))
        assert np.all(np.asarray(z) == 0.0)
        fb = m3.normalize_or(jnp.zeros((4, 3)), jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_array_equal(np.asarray(fb), np.tile([0, 1, 0], (4, 1)))

    def test_reflect(self):
        i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 1.0, 0.0]])
        r = m3.reflect(i, n)
        np.testing.assert_allclose(np.asarray(r)[0], [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)

    def test_refract_snell(self):
        # 45° into glass (eta = 1/1.5): sin(theta_t) = sin(45°)/1.5
        i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 1.0, 0.0]])
        t, can = m3.refract(i, n, jnp.array([1.0 / 1.5]))
        assert bool(can[0])
        sin_t = np.asarray(t)[0, 0]
        np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-6)

    def test_refract_tir(self):
        # Grazing exit from glass -> TIR
        i = jnp.array([[0.99, -0.14106736, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        _, can = m3.refract(m3.safe_normalize(i), n, jnp.array([1.5]))
        assert not bool(can[0])

    def test_onb_orthonormal(self, rng):
        n = m3.safe_normalize(jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32)))
        t, b = m3.make_onb(n)
        np.testing.assert_allclose(np.asarray(m3.dot(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m3.dot(b, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m3.dot(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m3.length(t)), 1.0, atol=1e-5)

    def test_faceforward(self):
        n = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
        d = jnp.array([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
        ff, entering = m3.faceforward(n, d)
        np.testing.assert_array_equal(np.asarray(entering), [True, False])
        np.testing.assert_allclose(np.asarray(ff), [[0, 1, 0], [0, -1, 0]])


class TestRng:
    def test_wang_hash_reference_values(self):
        # Scalar reference implementation (wf_math.h:35-44).
        def ref(a):
            a &= 0xFFFFFFFF
            a = (a ^ 61) ^ (a >> 16)
            a = (a * 9) & 0xFFFFFFFF
            a ^= a >> 4
            a = (a * 0x27D4EB2D) & 0xFFFFFFFF
            a ^= a >> 15
            return a

        xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
        got = np.asarray(rng_ops.wang_hash(jnp.asarray(xs)))
        want = np.array([ref(int(x)) for x in xs], np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_next_float_range_and_determinism(self):
        s = rng_ops.seed_paths(jnp.arange(10000, dtype=jnp.uint32), 3)
        s1, u = rng_ops.next_float(s)
        assert np.all((np.asarray(u) >= 0) & (np.asarray(u) < 1))
        s2, u2 = rng_ops.next_float(s)
        np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
        assert not np.array_equal(np.asarray(s1), np.asarray(s))

    def test_uniformity(self):
        s = rng_ops.seed_paths(jnp.arange(100000, dtype=jnp.uint32), 0)
        _, u = rng_ops.next_float(s)
        hist, _ = np.histogram(np.asarray(u), bins=16, range=(0, 1))
        assert hist.min() > 100000 / 16 * 0.9


class TestSampling:
    def test_cosine_sample_distribution(self):
        n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (200000, 1))
        s = rng_ops.seed_paths(jnp.arange(200000, dtype=jnp.uint32), 7)
        s, u1, u2 = rng_ops.next_float2(s)
        d = sampling.cosine_sample(n, u1, u2)
        d = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert np.all(d[:, 1] >= -1e-6)  # upper hemisphere
        # cosine-weighted: E[cos theta] = 2/3
        np.testing.assert_allclose(d[:, 1].mean(), 2.0 / 3.0, atol=5e-3)

    def test_ggx_half_vector_unit_and_aligned(self):
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (50000, 1))
        s = rng_ops.seed_paths(jnp.arange(50000, dtype=jnp.uint32), 1)
        s, u1, u2 = rng_ops.next_float2(s)
        h = sampling.ggx_sample_half_vector(u1, u2, jnp.float32(0.05**2), n)
        h = np.asarray(h)
        np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
        # tight lobe for alpha ~ 0.0025
        assert h[:, 2].min() > 0.9

    def test_ggx_rough_spreads(self):
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (50000, 1))
        s = rng_ops.seed_paths(jnp.arange(50000, dtype=jnp.uint32), 2)
        s, u1, u2 = rng_ops.next_float2(s)
        h_smooth = np.asarray(sampling.ggx_sample_half_vector(u1, u2, jnp.float32(0.01), n))
        h_rough = np.asarray(sampling.ggx_sample_half_vector(u1, u2, jnp.float32(1.0), n))
        assert h_rough[:, 2].mean() < h_smooth[:, 2].mean()

    def test_vndf_valid(self):
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (10000, 1))
        v = m3.safe_normalize(jnp.tile(jnp.array([[0.3, 0.1, 0.9]]), (10000, 1)))
        s = rng_ops.seed_paths(jnp.arange(10000, dtype=jnp.uint32), 3)
        s, u1, u2 = rng_ops.next_float2(s)
        h = sampling.ggx_sample_vndf(u1, u2, jnp.float32(0.25), n, v)
        h = np.asarray(h)
        np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-4)
        # VNDF guarantees dot(V, H) >= 0
        assert (h * np.asarray(v)).sum(-1).min() >= -1e-5

    def test_brdf_nonnegative_and_reciprocal_lambert(self):
        n = jnp.array([[0.0, 1.0, 0.0]])
        v = m3.safe_normalize(jnp.array([[0.5, 1.0, 0.0]]))
        l = m3.safe_normalize(jnp.array([[-0.3, 0.8, 0.1]]))
        f = sampling.evaluate_brdf(
            n, v, l,
            jnp.array([[0.5, 0.5, 0.5]]), jnp.array([0.0]),
            jnp.array([1.0]), jnp.array([1.0]),
        )
        assert np.all(np.asarray(f) >= 0.0)

    def test_fresnel_limits(self):
        f0 = jnp.array([[0.04, 0.04, 0.04]])
        # normal incidence -> F0; grazing -> 1
        at0 = sampling.fresnel_schlick(jnp.array([1.0]), f0)
        at90 = sampling.fresnel_schlick(jnp.array([0.0]), f0)
        np.testing.assert_allclose(np.asarray(at0)[0], 0.04, atol=1e-6)
        np.testing.assert_allclose(np.asarray(at90)[0], 1.0, atol=1e-6)


class TestTonemap:
    def test_resolve_matches_formula(self):
        accum = jnp.array([[2.0, 4.0, 0.5]])
        img = tonemap.resolve(accum, jnp.float32(2.0), exposure=2.2, gamma=2.2)
        c = np.array([1.0, 2.0, 0.25]) * 2.2
        want = np.power(c / (1 + c), 1 / 2.2)
        np.testing.assert_allclose(np.asarray(img)[0], want, rtol=1e-5)

    def test_resolve_zero_samples_black(self):
        img = tonemap.resolve(jnp.ones((4, 3)), jnp.float32(0.0))
        assert np.all(np.asarray(img) == 0.0)

    def test_aces_known_anchors(self):
        # ACES(0) = 0; large input saturates to 1.
        out = np.asarray(tonemap.aces(jnp.array([0.0, 100.0])))
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[1], 1.0, atol=1e-3)

    def test_to_u8(self):
        u = np.asarray(tonemap.to_u8(jnp.array([0.0, 0.5, 1.0, 2.0])))
        np.testing.assert_array_equal(u, [0, 127, 255, 255])
