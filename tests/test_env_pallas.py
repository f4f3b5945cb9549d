"""Pallas equirect env sampler vs the XLA sampler (interpreter mode).

The kernel (ops/pallas_env) must tap the exact texels the XLA path taps
(shared env._equirect_taps) and reproduce the bilinear result; lanes
outside `need` may return anything (callers mask), but must stay finite.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spt_tpu.env import (make_hdr_environment, sample_equirect_v,
                         synthetic_equirect)
from spt_tpu.ops.pallas_env import pallas_env_ok, sample_equirect_pallas
from spt_tpu.ops.vec3 import Vec3


def _dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                jnp.asarray(d[:, 2]))


class TestPallasEnv:
    def test_matches_xla_sampler(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 8, (64, 256, 3)).astype(np.float32))
        n = 2048
        dv = _dirs(n)
        need = jnp.asarray(rng.uniform(size=n) < 0.7)
        want = sample_equirect_v(img, dv)
        got = sample_equirect_pallas(img, dv, need, interpret=True)
        m = np.asarray(need)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                                       rtol=1e-5, atol=1e-5)
            assert np.isfinite(np.asarray(a)).all()

    def test_pole_and_seam_taps(self):
        # straight up/down (v-clamp collapse) and the u wrap seam
        img = jnp.asarray(synthetic_equirect(32))  # 32x64: tileable? no (w<128)
        img = jnp.asarray(synthetic_equirect(64))  # 64x128: minimum tileable
        d = np.array([[0, 1, 0], [0, -1, 0], [-1, 0, -1e-6], [-1, 0, 1e-6]],
                     np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = np.tile(d, (256, 1))  # 1024 lanes: one kernel tile
        dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                  jnp.asarray(d[:, 2]))
        need = jnp.ones((1024,), bool)
        want = sample_equirect_v(img, dv)
        got = sample_equirect_pallas(img, dv, need, interpret=True)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_gating(self):
        # procedural placeholder and non-tileable maps fall back to XLA
        assert not pallas_env_ok((1, 1, 3), 1024)
        assert not pallas_env_ok((32, 64, 3), 1024)
        assert not pallas_env_ok((64, 128, 3), 1000)  # lanes don't tile

    def test_environment_color_dispatch_unchanged(self):
        # environment_color_v(need=...) on CPU (XLA fallback) == without
        from spt_tpu.env import environment_color_v

        env = make_hdr_environment(synthetic_equirect(64))
        dv = _dirs(1024, seed=2)
        need = jnp.asarray(np.random.default_rng(3).uniform(size=1024) < 0.5)
        a = environment_color_v(env, dv)
        b = environment_color_v(env, dv, need=need)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestSortedSampler:
    """sample_equirect_pallas_sorted: the production deferred-env path —
    sorts taps by map tile id for coherence, then restores lane order.
    Must be value-identical to the XLA sampler on needed lanes (the taps
    are computed once and only reordered)."""

    def test_matches_xla_sampler_scattered(self):
        from spt_tpu.ops.pallas_env import sample_equirect_pallas_sorted

        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 8, (64, 256, 3)).astype(np.float32))
        n = 8192 + 1024  # forces padding to the 8192 sort chunk
        dv = _dirs(n, seed=4)
        need = jnp.asarray(rng.uniform(size=n) < 0.6)
        want = sample_equirect_v(img, dv)
        got = sample_equirect_pallas_sorted(img, dv, need, interpret=True)
        m = np.asarray(need)
        for a, b in zip(got, want):
            assert np.asarray(a).shape == (n,)
            np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                                       rtol=1e-5, atol=1e-5)

    def test_pole_rows(self):
        # the unclipped y floor must ride the sort: straight-up directions
        # (y0f = -1) tap row 0 twice, not rows 0 and 1
        from spt_tpu.ops.pallas_env import sample_equirect_pallas_sorted

        img = np.zeros((64, 128, 3), np.float32)
        img[0] = 1.0  # top row bright; row 1 black
        img = jnp.asarray(img)
        d = np.array([[1e-5, 1.0, 0.0]], np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = np.tile(d, (8192, 1))
        dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                  jnp.asarray(d[:, 2]))
        need = jnp.ones((8192,), bool)
        want = sample_equirect_v(img, dv)
        got = sample_equirect_pallas_sorted(img, dv, need, interpret=True)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_sorted_gating(self):
        from spt_tpu.ops.pallas_env import pallas_env_sorted_ok

        # CPU platform declines (the sorted path is TPU-only); small lane
        # counts decline
        assert not pallas_env_sorted_ok((64, 256, 3), 4096)
