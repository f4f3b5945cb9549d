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


def env_gather_tile(img_hbm, scratch, sem, wt, n_tiles, need,
                    x0, x1, y0, y1, fx, fy):
    """The tile-streaming bilinear gather for one (S, L) lane tile inside a
    Pallas kernel: min-extract the DISTINCT env-map tiles the 4 taps touch,
    one (3, 8, 128) DMA + composed row+column dynamic_gather per distinct
    tile.  Returns the RAW bilinear sample as a Vec3 (no clamp/intensity).
    Shared by the standalone kernel below and the fused bounce/frame
    kernels' per-bounce in-kernel env term (ops/pallas_bounce)."""
    s, l = need.shape

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
    return Vec3(out[4], out[5], out[6])


def env_taps_tile(h: int, w: int, d: Vec3):
    """In-kernel equirect tap setup: env._equirect_taps with the polynomial
    atan2/acos (Mosaic has no native inverse trig; ops/kernel_trig — max
    tap-coordinate error ~5e-4 texels on a 2048-wide map) and the modulo
    replaced by range-based wraps (u, v are already in [0, 1]).  Returns
    (x0i, x1i, y0i, y1i, fx, fy) exactly like the XLA version."""
    from spt_tpu.ops.kernel_trig import acos_poly, atan2_poly

    theta = atan2_poly(d.z, d.x)
    phi = acos_poly(d.y)
    u = (theta + np.float32(np.pi)) * np.float32(1.0 / (2.0 * np.pi))
    v = phi * np.float32(1.0 / np.pi)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    x0i = jnp.where(x0i < 0, x0i + w, x0i)      # x0 in [-1, w-1]
    x1i = jnp.where(x0i + 1 >= w, 0, x0i + 1)
    y0f = y0.astype(jnp.int32)
    y0i = jnp.clip(y0f, 0, h - 1)
    y1i = jnp.clip(y0f + 1, 0, h - 1)
    return x0i, x1i, y0i, y1i, fx, fy


def env_pretile(image):
    """(H, W, 3) -> (n_tiles, 3, 8, 128): each env-map tile one contiguous
    leading-dim DMA slab, tile id = (y>>3)*(W/128) + (x>>7)."""
    h, w = image.shape[0], image.shape[1]
    return jnp.transpose(
        image.reshape(h // 8, 8, w // LANES, LANES, 3),
        (0, 2, 4, 1, 3)).reshape((h // 8) * (w // LANES), 3, 8, LANES)


def _env_kernel(wt, n_tiles, need_r, x0r, x1r, y0r, y1r, fxr, fyr, img_hbm,
                out_r, out_g, out_b, scratch, sem):
    out = env_gather_tile(img_hbm, scratch, sem, wt, n_tiles,
                          need_r[:] != 0, x0r[:], x1r[:], y0r[:], y1r[:],
                          fxr[:], fyr[:])
    out_r[:], out_g[:], out_b[:] = out.x, out.y, out.z


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
    taps = _equirect_taps(h, w, d)
    return _sample_from_taps(image, taps, need, interpret)


def _sample_from_taps(image, taps, need, interpret: bool = False):
    h, w = image.shape[0], image.shape[1]
    x0i, x1i, y0i, y1i, fx, fy = taps
    n = need.shape[0]

    rows = n // LANES

    def r2(a):
        return a.reshape(rows, LANES)

    block = pl.BlockSpec((8, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    img3 = env_pretile(image)
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


_SORT_CHUNK = 8192


def pallas_env_sorted_ok(image_shape, n: int) -> bool:
    """Gate for the chunk-sorted tile sampler.  OFF unless
    SPT_PALLAS_ENV=sorted — a measured NEGATIVE result on the hdr glass
    bench (186 ms/frame vs the XLA takes' 53): an 8192-lane chunk of the
    mixed deferred field touches ~thousands of DISTINCT map tiles, so
    chunk-local sorting still leaves each (8, 128) kernel tile with
    hundreds of keys; only a global sort would consolidate, and its cost
    exceeds the gather it saves.  Kept (tested, TPU-verified) with the
    other two measured variants: SPT_PALLAS_ENV=1 the raw unsorted kernel
    (483 ms), SPT_ENV_KERNEL=1 the per-bounce in-kernel term (442 ms)."""
    if os.environ.get("SPT_PALLAS_ENV") != "sorted":
        return False
    h, w = image_shape[0], image_shape[1]
    if h < 8 or h % 8 or w < LANES or w % LANES:
        return False
    if n < 2 * _SORT_CHUNK or n % LANES:
        return False
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform not in ("cpu", "gpu")


def sample_equirect_pallas_sorted(image, d: Vec3, need,
                                  interpret: bool = False):
    """The deferred-env gather with MANUFACTURED coherence.

    The deferred miss field mixes every bounce's directions, and the raw
    tile-streaming kernel loses 7x on it (a lane tile touches ~hundreds of
    distinct map tiles, docs/DESIGN.md); per-bounce in-kernel sampling
    loses even harder (442 vs 53 ms on the hdr glass config — scattered
    glass bounces, 8x row-gather cost on the fused frame's (64, 128)
    tiles).  This path SORTS the taps by map tile id within 8192-lane
    chunks first (ops/ray_sort's VMEM bitonic — the traversal-coherence
    trick applied to texturing), so each (8, 128) kernel tile touches ~1-2
    map tiles regardless of how scattered the directions are, then
    restores lane order on the 3 result planes.

    Tap parity with env.sample_equirect_v is exact: the taps are computed
    ONCE (env._equirect_taps) and ride the sort as data — sorting only
    regroups lanes."""
    from spt_tpu.env import _derive_taps, _equirect_taps_raw
    from spt_tpu.ops import ray_sort

    h, w = image.shape[0], image.shape[1]
    n = d.x.shape[0]
    # the minimal tap state rides the sort; the second taps re-derive after
    # (pure functions of it — _derive_taps)
    x0i, y0f, fx, fy = _equirect_taps_raw(h, w, d)

    wt = np.int32(w // LANES)
    key = ((jnp.clip(y0f, 0, h - 1) >> 3) * wt + (x0i >> 7)).astype(
        jnp.uint32)
    key = jnp.where(need, key, jnp.uint32(0xFFFFFFFF))

    npad = (-n) % _SORT_CHUNK

    def pad(a):
        return jnp.pad(a, (0, npad)) if npad else a

    lane, (sx0, sy0f, sfx, sfy, sneed) = ray_sort.sort_by_key(
        pad(key),
        [pad(x0i), pad(y0f), pad(fx), pad(fy),
         pad(need.astype(jnp.int32))],
        _SORT_CHUNK,
    )
    rgb = _sample_from_taps(image, _derive_taps(h, w, sx0, sy0f, sfx, sfy),
                            sneed != 0, interpret)
    out = ray_sort.unsort_by_lane(lane, [rgb.x, rgb.y, rgb.z], _SORT_CHUNK)
    return Vec3(out[0][:n], out[1][:n], out[2][:n])
