"""Display transforms (the resolve stage's scalar math).

- Reinhard resolve chain: exposure -> c/(1+c) -> gamma encode
  (device_programs.cu:854-899 __raygen__resolve).
- ACES filmic polynomial (EnvironmentManager.cpp:63-74).
- The CPU quirk — ACES + gamma applied per-sample *before* accumulation
  (PathTracer.cpp:293-302, SURVEY.md §5 quirk 1) — is available for parity
  tests via :func:`aces_gamma_per_sample`.
"""

from __future__ import annotations

import jax.numpy as jnp


def aces(color: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic fit (a=2.51, b=0.03, c=2.43, d=0.59, e=0.14)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((color * (a * color + b)) / (color * (c * color + d) + e), 0.0, 1.0)


def reinhard(color: jnp.ndarray) -> jnp.ndarray:
    return color / (1.0 + color)


def gamma_encode(color: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    return jnp.power(jnp.maximum(color, 0.0), 1.0 / gamma)


def resolve(
    accum: jnp.ndarray,
    sample_count: jnp.ndarray,
    exposure: float = 2.2,
    gamma: float = 2.2,
    tonemap: str = "reinhard",
) -> jnp.ndarray:
    """accum/count -> display [0,1] (device_programs.cu:854-899).

    `accum` is (..., 3) linear HDR sums; `sample_count` is (...,) or scalar.
    """
    inv = jnp.where(sample_count > 0, 1.0 / jnp.maximum(sample_count, 1e-30), 0.0)
    c = jnp.maximum(accum * jnp.asarray(inv)[..., None], 0.0)
    c = c * exposure
    if tonemap == "reinhard":
        c = reinhard(c)
    elif tonemap == "aces":
        c = aces(c)
    elif tonemap != "none":
        raise ValueError(f"unknown tonemap {tonemap!r}")
    c = gamma_encode(c, gamma)
    return jnp.clip(c, 0.0, 1.0)


def aces_gamma_per_sample(color: jnp.ndarray) -> jnp.ndarray:
    """The CPU megakernel's per-traceRay transform (PathTracer.cpp:293-302):
    ACES then pow(1/2.2), applied before accumulation. Parity-test only."""
    return jnp.power(aces(color), 1.0 / 2.2)


def to_u8(image01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> uint8 (the uchar4 pack, device_programs.cu:893-898)."""
    return (jnp.clip(image01, 0.0, 1.0) * 255.0).astype(jnp.uint8)
