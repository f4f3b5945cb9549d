"""Environment: procedural sky + equirect HDR sampling."""

import jax.numpy as jnp
import numpy as np

from spt_tpu import env as env_mod

import reference_cpu as ref


class TestProceduralSky:
    def test_matches_scalar_formula(self, rng):
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = np.asarray(env_mod.procedural_sky(jnp.asarray(d)))
        for i in range(64):
            np.testing.assert_allclose(got[i], ref.sky_color(d[i]), rtol=1e-4, atol=1e-5)

    def test_zenith_bluer_than_horizon(self):
        up = np.asarray(env_mod.procedural_sky(jnp.array([[0.0, 1.0, 0.0]])))[0]
        # zenith: blue channel dominates
        assert up[2] > up[0]

    def test_sun_disk_bright(self):
        sun = env_mod.SUN_DIRECTION.astype(np.float32)
        c_sun = np.asarray(env_mod.procedural_sky(jnp.asarray(sun[None])))[0]
        c_away = np.asarray(env_mod.procedural_sky(jnp.array([[0.0, 0.3, 1.0]])))[0]
        assert c_sun.sum() > c_away.sum() + 0.5


class TestEquirect:
    def test_constant_image(self, rng):
        img = jnp.full((8, 16, 3), 3.0)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = np.asarray(env_mod.sample_equirect(img, jnp.asarray(d)))
        np.testing.assert_allclose(got, 3.0, atol=1e-5)

    def test_direction_mapping(self):
        # +y must sample the top row, -y the bottom row.
        img = np.zeros((4, 8, 3), np.float32)
        img[0] = [1, 0, 0]
        img[-1] = [0, 1, 0]
        up = np.asarray(env_mod.sample_equirect(jnp.asarray(img), jnp.array([[0.0, 1.0, 0.0]])))[0]
        down = np.asarray(env_mod.sample_equirect(jnp.asarray(img), jnp.array([[0.0, -1.0, 0.0]])))[0]
        assert up[0] > 0.9 and up[1] < 0.1
        assert down[1] > 0.9 and down[0] < 0.1

    def test_clamp_and_intensity(self):
        img = np.full((2, 4, 3), 100.0, np.float32)
        e = env_mod.make_hdr_environment(img, intensity=0.8, max_clamp=5.0)
        c = np.asarray(env_mod.environment_color(e, jnp.array([[0.0, 0.0, 1.0]])))[0]
        # clamp(100, 5) * 0.8 = 4.0 (EnvironmentManager.cpp:9-28)
        np.testing.assert_allclose(c, 4.0, atol=1e-5)

    def test_disabled_env_falls_back_to_sky(self):
        e = env_mod.make_procedural_environment()
        d = jnp.array([[0.0, 1.0, 0.0]])
        got = np.asarray(env_mod.environment_color(e, d))
        want = np.asarray(env_mod.procedural_sky(d))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPackedBilinear:
    """Neighborhood-packed one-take bilinear (Environment.packed): exact
    tap-for-tap equivalence with the four-take sampler, including the
    wrap seam and both pole rows."""

    def _dirs(self, n=4096, seed=3):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        # force some lanes straight at the poles and along the seam
        d[:8] = [0.0, 1.0, 0.0]
        d[8:16] = [0.0, -1.0, 0.0]
        d[16:24] = [-1.0, 0.0, -1e-5]
        d[24:32] = [-1.0, 0.0, 1e-5]
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return d

    def test_matches_four_take_sampler(self):
        from spt_tpu.env import (pack_bilinear, sample_equirect_packed_v,
                                 sample_equirect_v, synthetic_equirect)
        from spt_tpu.ops.vec3 import Vec3

        img = synthetic_equirect(32)
        packed = jnp.asarray(pack_bilinear(img))
        d = Vec3.from_array(jnp.asarray(self._dirs()))
        want = sample_equirect_v(jnp.asarray(img), d)
        got = sample_equirect_packed_v(img.shape[0], img.shape[1], packed, d)
        for a, b in zip(want, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_environment_color_uses_packed(self, monkeypatch):
        """make_hdr_environment builds the packed table only on opt-in
        (SPT_ENV_PACKED=1; default off — measured slower on real TPU) and
        environment_color_v routes through it with identical radiometry."""
        from spt_tpu import env as env_mod
        from spt_tpu.ops.vec3 import Vec3

        img = env_mod.synthetic_equirect(32)
        monkeypatch.setenv("SPT_ENV_PACKED", "1")
        e = env_mod.make_hdr_environment(img, intensity=0.8, max_clamp=5.0)
        assert e.packed is not None
        assert e.packed.shape == (32 * 64, 12)
        monkeypatch.delenv("SPT_ENV_PACKED")
        e_off = env_mod.make_hdr_environment(img)
        assert e_off.packed is None

        d = Vec3.from_array(jnp.asarray(self._dirs(seed=9)))
        got = env_mod.environment_color_v(e, d)
        want = env_mod.environment_color_v(e._replace(packed=None), d)
        for a, b in zip(want, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
