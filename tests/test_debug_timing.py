"""Debug render modes + telemetry utils."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu.camera import default_camera
from spt_tpu.config import RenderConfig
from spt_tpu.integrators.debug import MODES, render_debug
from spt_tpu.scene import build_test_triangle_scene, build_default_scene, flatten_scene
from spt_tpu.utils.timing import RayThroughput, StageTimer


CFG = RenderConfig(width=48, height=36)


class TestDebugModes:
    def test_geomtype_colors(self):
        # the bring-up fixture: triangles red, sphere green
        # (SceneBuilder.cpp:126-159 + device_programs.cu:837-846)
        scene = flatten_scene(build_test_triangle_scene())
        from spt_tpu.camera import Camera

        cam = Camera(position=(0, 0.5, 5), target=(0, 0.5, 0),
                     fov_degrees=60.0, aspect_ratio=CFG.width / CFG.height)
        img = np.asarray(render_debug(CFG, scene, cam.rays(), "geomtype"))
        assert (img[..., 0] > 0.5).any(), "no triangle pixels"
        assert (img[..., 1] > 0.5).any(), "no sphere pixels"
        # no pixel is both
        assert not ((img[..., 0] > 0.5) & (img[..., 1] > 0.5)).any()

    def test_hitmiss(self):
        scene = flatten_scene(build_default_scene())
        cam = default_camera(CFG.width, CFG.height)
        img = np.asarray(render_debug(CFG, scene, cam.rays(), "hitmiss"))
        vals = np.unique(img)
        assert set(vals.tolist()) <= {0.0, 1.0}
        assert 0.0 in vals and 1.0 in vals

    @pytest.mark.parametrize("mode", MODES)
    def test_all_modes_finite(self, mode):
        scene = flatten_scene(build_default_scene())
        cam = default_camera(CFG.width, CFG.height)
        img = np.asarray(render_debug(CFG, scene, cam.rays(), mode))
        assert img.shape == (CFG.height, CFG.width, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_bad_mode(self):
        scene = flatten_scene(build_default_scene())
        cam = default_camera(CFG.width, CFG.height)
        with pytest.raises(ValueError):
            render_debug(CFG, scene, cam.rays(), "bogus")


class TestTelemetry:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("b", block_on=jnp.ones(4)):
            pass
        assert t.totals["a"] >= 0.02
        assert t.counts["a"] == 2
        assert "a" in t.report() and "b" in t.report()

    def test_ray_throughput(self):
        from spt_tpu.integrators.wavefront import WavefrontStats

        rt = RayThroughput(n_lights=1)
        stats = WavefrontStats(
            rays_per_bounce=jnp.array([100, 40, 10, 0]), bounces_run=jnp.int32(3)
        )
        rt.add_frame(stats)
        # 150 path rays + 50 shadow rays
        assert rt.total_rays == 200
        assert rt.mrays_per_sec > 0
        assert "200" in rt.report() or "0.00" in rt.report()


class TestAnsiViewer:
    def test_to_ansi_frame(self):
        from spt_tpu.engine.display import _to_ansi

        img = np.zeros((20, 30, 3), np.float32)
        img[:10] = [1.0, 0.0, 0.0]   # top half red
        img[10:] = [0.0, 0.0, 1.0]   # bottom half blue
        frame = _to_ansi(img, cols=15, rows=5)
        lines = frame.split("\n")
        assert len(lines) == 5
        assert "▀" in frame
        assert "\x1b[38;2;255;0;0m" in frame   # red foreground somewhere
        assert "\x1b[48;2;0;0;255m" in frame   # blue background somewhere
        assert frame.endswith("\x1b[0m")

    def test_to_ansi_tiny_terminal(self):
        from spt_tpu.engine.display import _to_ansi

        img = np.ones((4, 4, 3), np.float32) * 0.5
        frame = _to_ansi(img, cols=2, rows=1)
        assert frame.count("▀") == 2
