"""Progressive renderer: accumulation, reset, checkpoint, image IO."""

import os

import numpy as np

from spt_tpu.camera import default_camera
from spt_tpu.config import RenderConfig
from spt_tpu.engine.image import read_png, write_png
from spt_tpu.engine.renderer import Renderer
from spt_tpu.scene import build_default_scene

CFG = RenderConfig(width=32, height=24, spp=1, max_depth=3)


def make_renderer():
    return Renderer(build_default_scene(), CFG,
                    camera=default_camera(CFG.width, CFG.height))


TOGGLE_CFG = RenderConfig(width=16, height=16, spp=1, max_depth=2)


class TestIntegratorToggle:
    def test_megakernel_through_renderer_matches_wavefront(self):
        # cfg.integrator="megakernel" runs the reference-CPU-backend role
        # behind the same progressive engine (same transport, same RNG)
        a = Renderer(build_default_scene(), TOGGLE_CFG,
                     camera=default_camera(16, 16), multi_device=False)
        a.render_frame()
        b = Renderer(build_default_scene(),
                     TOGGLE_CFG.replace(integrator="megakernel"),
                     camera=default_camera(16, 16), multi_device=False)
        b.render_frame()
        np.testing.assert_allclose(np.asarray(a.state.accum),
                                   np.asarray(b.state.accum),
                                   rtol=1e-3, atol=5e-4)
        # telemetry degrades gracefully: primaries counted, bounces opaque
        assert (int(np.asarray(b.last_stats.rays_per_bounce)[0])
                == TOGGLE_CFG.num_pixels)

    def test_toggle_resets_accumulation(self):
        # the reference's 'G' switch resets accumulation
        # (GLRenderer.cpp:263-277).  Single chip: the toggle no-ops on a
        # device mesh (the sharded step is a wavefront program).
        r = Renderer(build_default_scene(), TOGGLE_CFG,
                     camera=default_camera(16, 16), multi_device=False)
        r.render_frame()
        r.render_frame()
        assert r.accumulated_samples == 2 * TOGGLE_CFG.spp
        name = r.toggle_integrator()
        assert name == "megakernel"
        assert r.accumulated_samples == 0
        r.render_frame()
        assert r.accumulated_samples == TOGGLE_CFG.spp
        assert r.toggle_integrator() == "masked"
        assert r.accumulated_samples == 0

    def test_toggle_restores_selected_lane_scheduling(self):
        # Toggling from 'regen' must come BACK to 'regen', not hardcoded
        # 'masked' (round-3 advisor finding).
        r = Renderer(build_default_scene(),
                     TOGGLE_CFG.replace(integrator="regen"),
                     camera=default_camera(16, 16), multi_device=False)
        assert r.toggle_integrator() == "megakernel"
        assert r.toggle_integrator() == "regen"

    def test_megakernel_rejected_on_device_mesh(self):
        # A mesh renderer silently substituting the masked wavefront for a
        # requested megakernel would lie about the backend (round-3 advisor
        # finding); it must raise instead.
        import jax
        import pytest

        if jax.device_count() < 2:
            pytest.skip("needs a multi-device mesh")
        cfg = TOGGLE_CFG.replace(integrator="megakernel", height=16)
        with pytest.raises(ValueError, match="single-chip"):
            Renderer(build_default_scene(), cfg,
                     camera=default_camera(16, 16), multi_device=True)

    def test_megakernel_autodetect_yields_single_chip(self):
        # With multi_device UNSPECIFIED the user asked for a backend, not
        # a mesh: auto-detection must quietly fall back to single-chip
        # instead of crashing the CLI's --integrator megakernel on a
        # multi-device host (round-4 review finding).
        import jax
        import pytest

        if jax.device_count() < 2:
            pytest.skip("needs a multi-device mesh")
        cfg = TOGGLE_CFG.replace(integrator="megakernel", height=16)
        r = Renderer(build_default_scene(), cfg,
                     camera=default_camera(16, 16))
        assert r.mesh is None
        r.render_frame(check_camera=False)


class TestProgressive:
    def test_accumulation_counts(self):
        r = make_renderer()
        r.render_frame()
        assert r.accumulated_samples == CFG.spp
        r.render_frame()
        assert r.accumulated_samples == 2 * CFG.spp

    def test_render_frames_batched_equals_single(self):
        # k frames in one dispatch == k single-frame dispatches: same
        # accumulation, same frame index, same summed telemetry.
        import numpy as np

        a = make_renderer()
        for _ in range(3):
            a.render_frame()
        b = make_renderer()
        b.render_frames(3)
        np.testing.assert_allclose(np.asarray(a.state.accum),
                                   np.asarray(b.state.accum),
                                   rtol=1e-6, atol=1e-7)
        assert a.accumulated_samples == b.accumulated_samples
        assert int(a.state.frame_index) == int(b.state.frame_index)

    def test_progressive_mean_is_mean_of_frames(self):
        r = make_renderer()
        r.render_frame()
        f0 = r.hdr_image().copy()
        r.render_frame()
        mean2 = r.hdr_image()
        # accumulated mean lies between the two frames and equals their mean
        r2 = make_renderer()
        r2.render_frame()
        r2.state = r2.state._replace(
            accum=np.zeros_like(np.asarray(r2.state.accum)),
            sample_count=np.zeros_like(np.asarray(r2.state.sample_count)),
        )
        # direct check: 2*mean2 - f0 must be a valid single frame (frame 1)
        f1 = 2 * mean2 - f0
        assert np.isfinite(f1).all()
        np.testing.assert_allclose(mean2, (f0 + f1) / 2, atol=1e-5)

    def test_camera_move_resets(self):
        r = make_renderer()
        r.render_frame()
        r.render_frame()
        assert r.accumulated_samples == 2
        r.camera.process_keyboard(0, 0.5)
        r.render_frame()
        assert r.accumulated_samples == 1  # reset happened
        # frame_index kept advancing (RNG epoch monotonic)
        assert int(r.state.frame_index) == 3

    def test_variance_decreases(self):
        r = make_renderer()
        imgs = []
        for _ in range(2):
            r.render_frame()
        a = r.hdr_image()
        for _ in range(14):
            r.render_frame()
        b = r.hdr_image()
        # 16-frame mean closer to 64-frame mean than 2-frame mean is
        for _ in range(48):
            r.render_frame()
        c = r.hdr_image()
        assert np.mean((b - c) ** 2) < np.mean((a - c) ** 2)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        r = make_renderer()
        r.render_frame()
        r.render_frame()
        path = str(tmp_path / "ckpt.npz")
        r.save_checkpoint(path)
        img_before = r.image()

        r2 = make_renderer()
        r2.load_checkpoint(path)
        np.testing.assert_array_equal(img_before, r2.image())
        assert r2.accumulated_samples == 2
        # resumes seamlessly
        r2.render_frame(check_camera=False)
        assert r2.accumulated_samples == 3

    def test_roundtrip_without_npz_extension(self, tmp_path):
        # np.savez appends ".npz" to bare paths; save must write the exact
        # path given so `--checkpoint r.ckpt` + `--resume r.ckpt` round-trips.
        r = make_renderer()
        r.render_frame()
        path = str(tmp_path / "ckpt.dat")
        r.save_checkpoint(path)
        r2 = make_renderer()
        r2.load_checkpoint(path)
        np.testing.assert_array_equal(r.image(), r2.image())


class TestImageIO:
    def test_png_roundtrip(self, tmp_path):
        img = (np.random.default_rng(0).uniform(size=(17, 23, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "t.png")
        write_png(p, img)
        back = read_png(p)
        np.testing.assert_array_equal(back, img)

    def test_png_from_float(self, tmp_path):
        img = np.zeros((4, 4, 3), np.float32)
        img[0, 0] = [1.0, 0.5, 0.0]
        p = str(tmp_path / "f.png")
        write_png(p, img)
        back = read_png(p)
        assert back[0, 0, 0] == 255
        assert back[0, 0, 2] == 0

    def test_renderer_save(self, tmp_path):
        r = make_renderer()
        r.render_frame()
        p = str(tmp_path / "frame.png")
        r.save_png(p)
        assert os.path.getsize(p) > 100
        back = read_png(p)
        assert back.shape == (CFG.height, CFG.width, 3)


class TestResize:
    """Renderer.resize: the reference's buffer-reallocation-on-dimension-
    change contract (OptixBackend::resize, OptixBackend.cpp:1508-1543) —
    programs rebuild for the new dims, accumulation resets, camera pose
    survives with the new aspect ratio."""

    def test_resize_resets_and_renders_at_new_size(self):
        r = make_renderer()
        r.render_frames(2)
        assert r.accumulated_samples > 0
        r.resize(48, 32)
        assert r.cfg.width == 48 and r.cfg.height == 32
        assert r.accumulated_samples == 0
        assert abs(r.camera.aspect_ratio - 48 / 32) < 1e-6
        r.render_frame()
        img = r.image()
        assert img.shape == (32, 48, 3)
        assert np.isfinite(img).all() and img.max() > 0

    def test_resize_matches_fresh_renderer(self):
        """After a resize the render is sample-for-sample the render a
        fresh Renderer at that size produces (lanes are seeded by global
        pixel index, so nothing of the old size leaks through)."""
        r = make_renderer()
        r.render_frame()
        r.resize(40, 20)
        r.render_frame()
        cfg2 = CFG.replace(width=40, height=20)
        from spt_tpu.camera import Camera

        fresh = Renderer(build_default_scene(), cfg2,
                         camera=Camera(position=r.camera.position,
                                       target=(r.camera.position
                                               + r.camera.forward),
                                       fov_degrees=r.camera.fov,
                                       aspect_ratio=40 / 20))
        fresh.render_frame()
        np.testing.assert_allclose(r.image(), fresh.image(),
                                   rtol=1e-5, atol=1e-5)

    def test_resize_same_size_is_noop(self):
        r = make_renderer()
        r.render_frames(2)
        samples = r.accumulated_samples
        r.resize(CFG.width, CFG.height)
        assert r.accumulated_samples == samples

    def test_resize_on_mesh_keeps_sharding_when_height_tiles(self):
        import jax

        if jax.device_count() < 2:
            return
        n = jax.device_count()
        cfg = RenderConfig(width=16, height=2 * n, spp=1, max_depth=2)
        r = Renderer(build_default_scene(), cfg,
                     camera=default_camera(cfg.width, cfg.height),
                     multi_device=True)
        assert r.mesh is not None
        r.resize(16, 4 * n)
        assert r.mesh is not None, "tiling height must stay sharded"
        r.render_frame()
        assert r.image().shape == (4 * n, 16, 3)
        # non-tiling height: drops to single-chip rather than fail
        r.resize(16, 4 * n + 1)
        assert r.mesh is None
        r.render_frame()
        assert r.image().shape == (4 * n + 1, 16, 3)
