"""Inverse-trig for Pallas kernels: Mosaic has no native arctan2/arccos.

The per-bounce in-kernel env sampler (ops/pallas_bounce) needs the equirect
tap setup (env._equirect_taps — the device analog of the reference's
direction->uv math feeding its hardware texture fetch,
device_programs.cu:374-387) INSIDE the fused kernels.  These are pure
VPU-elementwise polynomial forms of atan2/acos:

* `atan_core`: odd degree-17 near-minimax polynomial of atan on [0, 1]
  (Chebyshev-node least squares; max |err| 1.2e-7 rad in f32 Horner form —
  ~4e-5 texels on a 2048-wide map, far below bilinear resolution).
* `atan2_poly`: the standard octant reduction t = min/max, quadrant fixups
  by select — every lane takes every op, branch-free.
* `acos_poly`: acos(y) = atan2(sqrt(1 - y^2), y).

atan2(0, 0) returns 0 like XLA's arctan2 (a pole-direction env tap; any
value inside the top/bottom texel row is equally right).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PI = np.float32(np.pi)
_HALF_PI = np.float32(np.pi / 2)

# atan(x) = x * P(x^2) on [0, 1]; see module docstring.
_ATAN_C = tuple(
    np.float32(v)
    for v in (0.9999999, -0.33332658, 0.19986537, -0.14164332,
              0.10507314, -0.07247938, 0.039899413, -0.014458605,
              0.0024682235)
)


def atan_core(t):
    """atan for t in [0, 1] (polynomial, f32)."""
    t2 = t * t
    acc = jnp.full_like(t, _ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        acc = acc * t2 + c
    return acc * t


def atan2_poly(y, x):
    """Branch-free atan2 matching jnp.arctan2 to ~1.5e-7 rad (and exactly 0
    at (0, 0))."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(1e-30))
    a = atan_core(t)
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def acos_poly(y):
    """acos via atan2(sqrt(1 - y^2), y); y is clipped to [-1, 1]."""
    y = jnp.clip(y, -1.0, 1.0)
    return atan2_poly(jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)), y)
