"""Debug render modes — the reference's bring-up tooling.

The reference keeps a legacy raygen purely for debugging (__raygen__rg,
device_programs.cu:695-849) with two modes in LaunchParams (debug_mode,
LaunchParams.h:76-78):

- mode 0 "geomtype": triangles red, spheres green (device_programs.cu:
  837-846 + SceneBuilder.cpp:156's "spheres green" note) — validates GAS/SBT
  wiring there, primitive dispatch here;
- mode 1 "hitmiss": hit white / miss black (cu:727-731);

plus we add "normal" (the Ng visualization the GPU paints at max depth,
cu:424-439), "depth" (1/t ramp) and "matid" (material-id palette — the
MaterialManager debug color table, MaterialManager.cpp:105-133).
"""

from __future__ import annotations

import jax.numpy as jnp

from spt_tpu.config import RenderConfig
from spt_tpu.camera import CameraRays
from spt_tpu.integrators import transport
from spt_tpu.ops import intersect as isect
from spt_tpu.ops import vec3 as v3
from spt_tpu.scene.flatten import DeviceScene

MODES = ("geomtype", "hitmiss", "normal", "depth", "matid")

# MaterialManager::getColorFromGeometryID-style palette (MaterialManager.cpp:
# 105-133): distinct colors cycling by id.
_PALETTE = jnp.asarray(
    [
        [1.0, 0.2, 0.2], [0.2, 1.0, 0.2], [0.2, 0.2, 1.0],
        [1.0, 1.0, 0.2], [1.0, 0.2, 1.0], [0.2, 1.0, 1.0],
        [1.0, 0.6, 0.2], [0.6, 0.2, 1.0], [0.7, 0.7, 0.7],
    ],
    jnp.float32,
)


def render_debug(
    cfg: RenderConfig,
    scene: DeviceScene,
    camera: CameraRays,
    mode: str = "geomtype",
) -> jnp.ndarray:
    """Single primary-ray debug image -> (H, W, 3) in [0, 1]."""
    if mode not in MODES:
        raise ValueError(f"debug mode {mode!r} not in {MODES}")
    ps = transport.gen_primary(cfg.replace(jitter=False), camera, 0)
    hit = isect.intersect_v(scene, ps.origin, ps.direction, tmin=0.0)
    n = ps.num_paths

    hitm = hit.hit_mask
    if mode == "hitmiss":
        c = hitm.astype(jnp.float32)
        img = jnp.stack([c, c, c], axis=-1)
    elif mode == "geomtype":
        is_tri = hit.kind == isect.KIND_TRIANGLE
        is_sph = hit.kind == isect.KIND_SPHERE
        r = is_tri.astype(jnp.float32)
        g = is_sph.astype(jnp.float32)
        img = jnp.stack([r, g, jnp.zeros_like(r)], axis=-1)
    elif mode == "normal":
        up = v3.Vec3.full((0.0, 1.0, 0.0), (n,))
        ng = v3.normalize_or(hit.normal, up)
        nvis = (ng + 1.0) * 0.5
        img = nvis.to_array() * hitm.astype(jnp.float32)[:, None]
    elif mode == "depth":
        t = jnp.where(hitm, hit.t, jnp.inf)
        c = 1.0 / (1.0 + t)
        img = jnp.stack([c, c, c], axis=-1)
    else:  # matid
        col = _PALETTE[hit.mat_id % _PALETTE.shape[0]]
        img = col * hitm.astype(jnp.float32)[:, None]

    return jnp.clip(img, 0.0, 1.0).reshape(cfg.height, cfg.width, 3)
