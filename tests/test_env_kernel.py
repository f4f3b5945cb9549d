"""Per-bounce IN-KERNEL env resolution vs the deferred XLA gather.

The fused kernels can resolve each bounce's miss lanes against the HDR
equirect map inside the kernel (pallas_bounce._make_env_fn: polynomial
inverse trig + tile-streaming gathers), replacing the deferred
environment_color_v call — the reference's structure, where the env fetch
lives inside the shade kernel (device_programs.cu:374-412).  Interpreter
mode; radiometric equality against the deferred path is the gate.
"""

import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu.camera import default_camera
from spt_tpu.config import RenderConfig
from spt_tpu.env import (_equirect_taps, environment_color_v,
                         make_hdr_environment, synthetic_equirect)
from spt_tpu.integrators import transport
from spt_tpu.lights import default_lights
from spt_tpu.ops.vec3 import Vec3
from spt_tpu.scene import build_default_scene, flatten_scene

import spt_tpu.ops.pallas_bounce as pb


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pb.pl, "pallas_call", patched)
    # the in-kernel env is opt-in (a measured loss on the hdr glass bench;
    # the production path is the sorted deferred gather)
    monkeypatch.setenv("SPT_ENV_KERNEL", "1")


def _rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                jnp.asarray(d[:, 2]))


def test_env_taps_tile_matches_xla_taps():
    """The polynomial tap setup picks the same texels as the XLA version
    (up to floor-boundary lanes, where both straddle one texel and the
    bilinear weight at the flip is ~0 or ~1 — value-identical)."""
    from spt_tpu.ops.pallas_env import env_taps_tile

    h, w = 64, 256
    d = _rand_dirs(4096)
    ref = _equirect_taps(h, w, d)
    got = env_taps_tile(h, w, d)
    # compare the reconstructed continuous tap coordinate, not the floor
    ref_x = np.asarray(ref[0]) + np.asarray(ref[4])
    got_x = np.asarray(got[0]) + np.asarray(got[4])
    dx = np.abs(ref_x - got_x)
    dx = np.minimum(dx, w - dx)  # u wraps
    assert dx.max() < 1e-2
    ref_y = np.asarray(ref[2]) + np.asarray(ref[5])
    got_y = np.asarray(got[2]) + np.asarray(got[5])
    assert np.abs(ref_y - got_y).max() < 1e-2


def test_env_in_kernel_ok_gating(monkeypatch):
    img = synthetic_equirect(height=32)  # (32, 64, 3): w < 128 -> declines
    assert not pb.env_in_kernel_ok(make_hdr_environment(img))
    img = np.zeros((64, 256, 3), np.float32)
    env = make_hdr_environment(img)
    assert pb.env_in_kernel_ok(env)  # fixture sets SPT_ENV_KERNEL=1
    monkeypatch.delenv("SPT_ENV_KERNEL")
    assert not pb.env_in_kernel_ok(env)  # opt-in: off by default
    monkeypatch.setenv("SPT_ENV_KERNEL", "0")
    assert not pb.env_in_kernel_ok(env)
    assert not pb.env_in_kernel_ok(None)


class TestInKernelEnv:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = RenderConfig(width=64, height=128, spp=1, max_depth=4)
        scene = flatten_scene(build_default_scene())
        lights = default_lights()
        rng = np.random.default_rng(7)
        img = rng.uniform(0.0, 2.0, (64, 256, 3)).astype(np.float32)
        img[5, 40] = (80.0, 70.0, 60.0)  # over-clamp hot texel
        env = make_hdr_environment(img)
        cam = default_camera(cfg.width, cfg.height).rays()
        ps = transport.gen_primary(cfg, cam, 0)
        return cfg, scene, lights, env, ps

    def test_fused_bounce_env_matches_deferred(self, setup):
        cfg, scene, lights, env, ps = setup
        a, ma = pb.fused_bounce(cfg, scene, lights, ps, 0, False)
        env_c = environment_color_v(env, ps.direction, need=ma)
        zero3 = Vec3.full((0, 0, 0), (ps.num_paths,))
        from spt_tpu.ops import vec3 as v3

        rad_a = a.radiance + v3.where(ma, ps.throughput * env_c, zero3)

        b, mb = pb.fused_bounce(cfg, scene, lights, ps, 0, False, env=env)
        assert not bool(np.asarray(mb).any())  # nothing owed
        ra = np.asarray(rad_a.to_array())
        rb = np.asarray(b.radiance.to_array())
        assert np.abs(ra - rb).max() < 2e-3
        # everything else identical
        np.testing.assert_array_equal(np.asarray(a.rng), np.asarray(b.rng))
        np.testing.assert_array_equal(np.asarray(a.alive),
                                      np.asarray(b.alive))

    def test_fused_frame_env_matches_deferred(self, setup):
        cfg, scene, lights, env, ps = setup
        rad_a, dir_a, thr_a, missed_a, rays_a = pb.fused_frame(
            cfg, scene, lights, ps)
        env_c = environment_color_v(env, dir_a, need=missed_a)
        zero3 = Vec3.full((0, 0, 0), (ps.num_paths,))
        from spt_tpu.ops import vec3 as v3

        rad_a = rad_a + v3.where(missed_a, thr_a * env_c, zero3)

        rad_b, _, _, missed_b, rays_b = pb.fused_frame(
            cfg, scene, lights, ps, env=env)
        assert not bool(np.asarray(missed_b).any())
        ra = np.asarray(rad_a.to_array())
        rb = np.asarray(rad_b.to_array())
        rel = np.abs(ra - rb).max() / max(1e-6, np.abs(ra).max())
        assert rel < 1e-3
        np.testing.assert_array_equal(np.asarray(rays_a),
                                      np.asarray(rays_b))

    def test_disabled_env_selects_sky_in_kernel(self, setup):
        """`enabled` rides in as data: a disabled env with a tileable image
        must reproduce the procedural sky (the where() inside the kernel),
        not the texture."""
        cfg, scene, lights, env, ps = setup
        env_off = env._replace(enabled=jnp.asarray(False))
        assert pb.env_in_kernel_ok(env_off)  # shape-static decision
        rad_b, _, _, _, _ = pb.fused_frame(cfg, scene, lights, ps,
                                           env=env_off)
        rad_a, dir_a, thr_a, missed_a, _ = pb.fused_frame(
            cfg, scene, lights, ps)
        env_c = environment_color_v(env_off, dir_a, need=missed_a)
        zero3 = Vec3.full((0, 0, 0), (ps.num_paths,))
        from spt_tpu.ops import vec3 as v3

        rad_a = rad_a + v3.where(missed_a, thr_a * env_c, zero3)
        ra = np.asarray(rad_a.to_array())
        rb = np.asarray(rad_b.to_array())
        rel = np.abs(ra - rb).max() / max(1e-6, np.abs(ra).max())
        assert rel < 1e-3
