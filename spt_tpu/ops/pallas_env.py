"""Pallas equirectangular environment sampler: tile-coherent HDR lookups.

The XLA bilinear equirect sampler (env.sample_equirect_v) is one 4-tap
gather per lane — and XLA lowers per-lane gathers on TPU to a serialized
scalar path: ONE full-width evaluation over a 1920x1080 frame against the
1024x2048 bench sun-sky measures **70.9 ms**, i.e. the entire HDR bench
config was one gather call (docs/DESIGN.md).  Map size is irrelevant — a
64x128 map is just as slow — the per-lane gather itself is the cost.

This kernel is the texture-sampler trick (ops/pallas_bounce.
_make_texture_sampler) applied to the environment, with one addition:
equirect maps are too big for VMEM (the bench map is 24 MB), so tiles
stream HBM -> VMEM on demand like the triangle stream (ops/pallas_stream):

 * The trig / tap setup (atan2, acos, texel-center bilinear coords) stays
   in XLA — cheap elementwise lane math, and shared verbatim with the XLA
   sampler (env._equirect_taps) so both paths tap identical texels.
 * Per (8, 128) lane tile, the kernel min-extracts the DISTINCT env-map
   tiles its four taps touch (keys: (y>>3)*(W/128) + (x>>7); lanes outside
   `need` carry MISS keys).  Each distinct tile is ONE async copy
   (3, 8, 128) from HBM and one composed row+column dynamic_gather per
   channel per tap.  Primary-miss lanes are image-coherent, so a lane tile
   typically touches 1-4 env tiles; a tile with no needing lane exits the
   loop without copying anything.

Semantics: returns the RAW bilinear sample (wrap in u, per-tap clamp in v,
texel-center weights) — the caller applies the clamp * intensity and the
enabled mask, keeping env.environment_color_v the single place the
EnvironmentManager.h:12-13 semantics live.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.ops.vec3 import Vec3

LANES = 128
_MISS = np.int32(0x7FFFFFFF)


def _gather_rc_f32(tile_i32, r, c, s, l):
    """Float (r, c) gather from one (8, 128) tile held as int32 bits
    (pallas_bounce._gather_rc composes the two Mosaic dynamic_gather
    directions; bitcasting keeps the f32 payload intact through the
    integer gather)."""
    from spt_tpu.ops.pallas_bounce import _gather_rc

    return pltpu.bitcast(_gather_rc(tile_i32, r, c, s, l), jnp.float32)


def _env_kernel(wt, n_tiles, need_r, x0r, x1r, y0r, y1r, fxr, fyr, img_hbm,
                out_r, out_g, out_b, scratch, sem):
    s, l = need_r.shape
    need = need_r[:] != 0
    x0, x1, y0, y1 = x0r[:], x1r[:], y0r[:], y1r[:]
    fx, fy = fxr[:], fyr[:]

    def key(yi, xi):
        # clamp: a degenerate lane (NaN direction -> garbage int tap after
        # floor()) must gather garbage like the XLA path (jnp.take clips),
        # NOT drive the DMA out of bounds — an OOB slab copy faults the
        # whole TPU worker (observed after ~dozens of accumulated frames
        # on the HDR glass scene, when the first NaN sample appears).
        tid = jnp.clip((yi >> 3) * wt + (xi >> 7), 0, n_tiles - 1)
        return jnp.where(need, tid, _MISS)

    taps = (
        (key(y0, x0), y0, x0, (1.0 - fx) * (1.0 - fy)),
        (key(y0, x1), y0, x1, fx * (1.0 - fy)),
        (key(y1, x0), y1, x0, (1.0 - fx) * fy),
        (key(y1, x1), y1, x1, fx * fy),
    )

    def cond(carry):
        k0, k1, k2, k3 = carry[:4]
        return jnp.min(jnp.minimum(jnp.minimum(k0, k1),
                                   jnp.minimum(k2, k3))) < _MISS

    def body(carry):
        keys, acc = carry[:4], carry[4:]
        m = jnp.min(jnp.minimum(jnp.minimum(keys[0], keys[1]),
                                jnp.minimum(keys[2], keys[3])))
        # one contiguous (3, 8, 128) slab per tile (the img is pre-tiled in
        # the wrapper): leading-dim DMA, the same shape pallas_stream uses —
        # a strided [:, ds, ds] copy from an (3, H, W) layout faulted the
        # TPU worker.
        cp = pltpu.make_async_copy(img_hbm.at[m], scratch, sem)
        cp.start()
        cp.wait()
        tiles = [pltpu.bitcast(scratch[ch], jnp.int32) for ch in range(3)]
        new_acc = list(acc)
        new_keys = []
        for ti, (_, yi, xi, w) in enumerate(taps):
            k = keys[ti]
            sel = k == m
            r_in = yi & 7
            c_in = xi & (LANES - 1)
            for ch in range(3):
                g = _gather_rc_f32(tiles[ch], r_in, c_in, s, l)
                new_acc[ch] = new_acc[ch] + jnp.where(sel, w * g, 0.0)
            new_keys.append(jnp.where(sel, _MISS, k))
        return tuple(new_keys) + tuple(new_acc)

    zero = jnp.zeros((s, l), jnp.float32)
    out = jax.lax.while_loop(
        cond, body,
        tuple(t[0] for t in taps) + (zero, zero, zero))
    out_r[:], out_g[:], out_b[:] = out[4], out[5], out[6]


def pallas_env_ok(image_shape, n: int) -> bool:
    """The kernel needs a TPU, an (8, 128)-tileable map, and a lane count
    that tiles; everything else falls back to the XLA sampler.

    OFF unless SPT_PALLAS_ENV=1 — a measured NEGATIVE result for the
    production call site (docs/DESIGN.md): the deferred env field mixes
    every bounce's miss directions, and on the HDR glass bench the
    scattered lanes make a lane tile touch ~hundreds of distinct map
    tiles (483 ms/frame vs the XLA sampler's 71; on purely COHERENT
    pixel-order directions the same kernel wins 3.3x, 21.4 vs 70.9 ms).
    Kept (tested, TPU-verified) for workloads that can feed it coherent
    lookups."""
    if os.environ.get("SPT_PALLAS_ENV", "0") != "1":
        return False
    h, w = image_shape[0], image_shape[1]
    if h < 8 or h % 8 or w < LANES or w % LANES:
        return False
    if n % (8 * LANES):
        return False
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform not in ("cpu", "gpu")


def sample_equirect_pallas(image, d: Vec3, need, interpret: bool = False):
    """Bilinear equirect sample of `image` (H, W, 3) for (N,) direction
    planes; `need` (N,) bool — lanes outside it return 0 and, when a whole
    (8, 128) tile has none, that tile copies nothing from HBM.  Tap
    parity with env.sample_equirect_v is by construction (shared
    env._equirect_taps)."""
    from spt_tpu.env import _equirect_taps

    h, w = image.shape[0], image.shape[1]
    n = d.x.shape[0]
    x0i, x1i, y0i, y1i, fx, fy = _equirect_taps(h, w, d)

    rows = n // LANES

    def r2(a):
        return a.reshape(rows, LANES)

    block = pl.BlockSpec((8, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    # pre-tile to (n_tiles, 3, 8, 128) so each map tile is one contiguous
    # leading-dim DMA slab (tile id = (y>>3)*(W/128) + (x>>7))
    img3 = jnp.transpose(
        image.reshape(h // 8, 8, w // LANES, LANES, 3),
        (0, 2, 4, 1, 3)).reshape((h // 8) * (w // LANES), 3, 8, LANES)
    outs = pl.pallas_call(
        functools.partial(_env_kernel, np.int32(w // LANES),
                          np.int32((h // 8) * (w // LANES))),
        grid=(rows // 8,),
        in_specs=[block] * 7 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[block] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(r2(need.astype(jnp.int32)), r2(x0i), r2(x1i), r2(y0i), r2(y1i),
      r2(fx), r2(fy), img3)
    return Vec3(outs[0].reshape(n), outs[1].reshape(n), outs[2].reshape(n))
