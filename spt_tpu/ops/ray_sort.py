"""Wavefront ray sorting: gather-free lane reordering for trace coherence.

The mesh tracer (ops/pallas_trace) culls clusters at ray-SUBTILE granularity
(any-lane-of-1024 opens the cluster), so its cost is set by how coherent the
1024 rays in a subtile are.  Primary rays are coherent by construction;
diffuse bounce rays are not — measured on the glTF chair, bounce-1 subtiles
in pixel order open 30.1 clusters on average while the same rays sorted by
direction octant open 10.1 (and most of that win is packing the ~89 % dead
lanes into whole-dead subtiles the kernels skip outright).

The reorder must not gather: 1-D gathers of 13 lane planes measure ~28 ms at
196k lanes on TPU (scalar gather path).  Instead the planes ride through a
multi-operand `lax.sort` — the compare-exchange network moves all operands
together, and sorting within fixed CHUNKS (minor-axis batched sort) keeps
the network shallow.  Measured: a 9-operand 8192-chunk sort is ~6 ms at
196k lanes, and chunked sorting loses almost nothing over a global sort
(30.1 -> 12.2 vs 10.1 opens).

Used by integrators/wavefront for mesh scenes: primary bounce full-width,
one sort, then the fused frame kernel runs the remaining bounces on
coherent lanes (the classic wavefront ray-binning idea — Laine et al. 2013,
"Megakernels considered harmful" — in its TPU-shaped form).  The reference
never sorts; its OptiX BVH absorbs incoherence per-thread
(OptixBackend.cpp:1705-1734), a luxury a vector machine does not have.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spt_tpu.ops.vec3 import Vec3

_DEAD_KEY = jnp.uint32(0xFFFFFFFF)


def chunk_size(n: int) -> int:
    """Largest supported sort chunk dividing n (0 = sorting unavailable).

    8192 first: dead lanes pack at chunk granularity, so bigger chunks skip
    more whole-dead subtiles; the deeper network costs less than it saves.
    SPT_SORT_CHUNK overrides for experiments."""
    import os
    import warnings

    default_prefs = (8192, 4096, 2048)
    env = os.environ.get("SPT_SORT_CHUNK")
    prefs = default_prefs
    if env:
        try:
            prefs = (int(env),)
        except ValueError:
            warnings.warn(f"SPT_SORT_CHUNK={env!r} is not an integer; "
                          "using the default chunk preferences")
    for c in prefs:
        if n % c == 0 and n > c:
            return c
    if env and prefs != default_prefs:
        warnings.warn(
            f"SPT_SORT_CHUNK={env} does not divide the lane count {n}; "
            "falling back to the default chunk preferences"
        )
        for c in default_prefs:
            if n % c == 0 and n > c:
                return c
    return 0


def sort_key(direction: Vec3, origin: Vec3, alive, lo, inv_extent) -> jnp.ndarray:
    """uint32 sort key: dead lanes last; live lanes by direction octant then
    origin morton (the octant dominates the open-count win; morton is free).

    SPT_SORT_KEY picks the bit layout for A/B experiments:
      octant (default)  octant[3] | morton[27]
      morton            morton[30] (direction ignored)
      hybrid            morton_hi[9] | octant[3] | morton_lo[18]
    The tracer culls clusters per 1024-lane tile, so the key decides
    whether a tile's lanes share a direction cone (octant) or an origin
    neighborhood (morton) — which one minimizes opens is scene-dependent
    and measured, not assumed.

    `lo`/`inv_extent`: scene bounds (3,) f32 arrays for origin quantization.
    """
    import os

    octant = ((direction.x < 0).astype(jnp.uint32) * 4
              + (direction.y < 0).astype(jnp.uint32) * 2
              + (direction.z < 0).astype(jnp.uint32))

    def q(v, i):
        f = jnp.clip((v - lo[i]) * inv_extent[i], 0.0, 1.0)
        return (f * 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = (spread(q(origin.x, 0))
              | (spread(q(origin.y, 1)) << 1)
              | (spread(q(origin.z, 2)) << 2))
    mode = os.environ.get("SPT_SORT_KEY", "octant")
    if mode == "morton":
        key = morton
    elif mode == "hybrid":
        key = (((morton >> jnp.uint32(21)) << jnp.uint32(21))
               | (octant << jnp.uint32(18))
               | ((morton >> jnp.uint32(3)) & jnp.uint32(0x3FFFF)))
    else:
        key = (octant << jnp.uint32(27)) | (morton >> jnp.uint32(5))
    return jnp.where(alive, key, _DEAD_KEY)


def _pallas_sort_ok(chunk: int) -> bool:
    """The VMEM bitonic kernel runs on TPU for power-of-two chunks that
    tile into (rows, 128) blocks (ops/pallas_sort)."""
    import os

    if os.environ.get("SPT_NO_PALLAS_SORT"):
        return False
    if chunk % 128 != 0 or chunk & (chunk - 1) != 0:
        return False
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform not in ("cpu", "gpu")


def sort_by_key(key, operands, chunk: int):
    """Sort the (N,) operand arrays by `key` within `chunk`-lane chunks.

    Returns (lane_id, sorted_operands): lane_id[i] is the pre-sort position
    of the lane now at i (feed to unsort_by_lane).  Bool operands are not
    supported by every backend's sort lowering — cast to int32 first.

    On TPU the sort runs as a VMEM-resident Pallas bitonic network
    (ops/pallas_sort) — one HBM read + write of the operands instead of one
    per compare-exchange level.  Bitonic is not stable, but lane identity
    rides along and every tie (dead lanes, equal octants) is
    order-irrelevant to the caller.
    """
    n = key.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    if _pallas_sort_ok(chunk):
        from spt_tpu.ops import pallas_sort

        _, out = pallas_sort.sort_chunks(key, [lane] + list(operands), chunk)
        return out[0], out[1:]
    k2 = key.reshape(-1, chunk)
    ops = (k2, lane.reshape(-1, chunk)) + tuple(
        a.reshape(-1, chunk) for a in operands
    )
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    lane_id = out[1].reshape(n)
    return lane_id, [a.reshape(n) for a in out[2:]]


def unsort_by_lane(lane_id, operands, chunk: int):
    """Inverse of sort_by_key: restore original lane order (lane_id is a
    permutation — chunk-locally all-distinct — so one more chunked sort
    keyed on it suffices)."""
    n = lane_id.shape[0]
    if _pallas_sort_ok(chunk):
        from spt_tpu.ops import pallas_sort

        # lane ids are nonnegative: reinterpret as uint32, order unchanged
        _, out = pallas_sort.sort_chunks(lane_id.astype(jnp.uint32),
                                         list(operands), chunk)
        return out
    ops = (lane_id.reshape(-1, chunk),) + tuple(
        a.reshape(-1, chunk) for a in operands
    )
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    return [a.reshape(n) for a in out[1:]]
