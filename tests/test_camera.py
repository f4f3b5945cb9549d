"""Camera semantics (Camera.cpp parity)."""

import numpy as np

from spt_tpu.camera import Camera, default_camera


class TestCamera:
    def test_center_ray_is_forward(self):
        cam = default_camera()
        d = cam.get_ray_direction(0.5, 0.5)
        np.testing.assert_allclose(d, cam.forward, atol=1e-6)

    def test_y_flip(self):
        # y < 0.5 (upper image half) must point upward of forward
        cam = default_camera()
        up_ray = cam.get_ray_direction(0.5, 0.25)
        down_ray = cam.get_ray_direction(0.5, 0.75)
        assert up_ray @ cam.up > 0
        assert down_ray @ cam.up < 0

    def test_batched_matches_scalar(self, rng):
        cam = default_camera()
        xs = rng.uniform(size=32).astype(np.float32)
        ys = rng.uniform(size=32).astype(np.float32)
        batched = np.asarray(cam.rays().ray_directions(xs, ys))
        for i in range(32):
            np.testing.assert_allclose(
                batched[i], cam.get_ray_direction(float(xs[i]), float(ys[i])), atol=1e-6
            )

    def test_yaw_pitch_from_target(self):
        # looking straight down -z: yaw = -90, pitch = 0
        cam = Camera(position=(0, 0, 0), target=(0, 0, -5))
        np.testing.assert_allclose(cam.yaw, -90.0, atol=1e-5)
        np.testing.assert_allclose(cam.pitch, 0.0, atol=1e-5)

    def test_fov_extents(self):
        cam = Camera(position=(0, 0, 0), target=(0, 0, -1), fov_degrees=90.0, aspect_ratio=2.0)
        np.testing.assert_allclose(cam.half_height, 1.0, atol=1e-6)
        np.testing.assert_allclose(cam.half_width, 2.0, atol=1e-6)

    def test_movement_detection(self):
        cam = default_camera()
        assert cam.has_moved_since_last_check()          # first check -> True
        assert not cam.has_moved_since_last_check()      # stationary
        cam.process_keyboard(0, 0.1)                     # move forward
        assert cam.has_moved_since_last_check()
        assert not cam.has_moved_since_last_check()
        cam.process_mouse(5.0, 0.0)                      # look
        assert cam.has_moved_since_last_check()

    def test_pitch_clamp(self):
        cam = default_camera()
        cam.process_mouse(0.0, 10000.0)
        assert cam.pitch == 89.0

    def test_wasd_directions(self):
        cam = Camera(position=(0, 0, 0), target=(0, 0, -1))
        cam.process_keyboard(3, 1.0)  # RIGHT
        assert cam.position[0] > 0    # right of -z view is +x
