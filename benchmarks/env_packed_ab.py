"""A/B the neighborhood-packed env fetch against the four-take bilinear.

Times ONE full deferred-env evaluation (the hdr bench's dominant op) at
1080p lane count against the bench-scale 1024x2048 map, three ways:

  four-take   sample_equirect_v        (round-3 optimum: 4 flat takes)
  packed      sample_equirect_packed_v (one (N,12) take)
  snap        sample_equirect_snap_v   (one (N,3) take off the 2x table)
  take-width  raw jnp.take micro: (N,1) vs (N,3) vs (N,12) at the same
              addresses — isolates the addressing-vs-bytes question the
              packed design rests on

Chained with data dependence (the fori-hoisting trap, docs/DESIGN.md
"Measuring anything").  Run ON THE TPU from the repo root:
    PYTHONPATH=.:/root/.axon_site python benchmarks/env_packed_ab.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

from spt_tpu.env import (make_snap_table, pack_bilinear,
                         sample_equirect_packed_v, sample_equirect_snap_v,
                         sample_equirect_v, synthetic_equirect)
from spt_tpu.ops.vec3 import Vec3

N = 1920 * 1080
H, W = 1024, 2048
ROUNDS = 8


def _chain(fn):
    """fn(d: Vec3) -> Vec3; chains ROUNDS evaluations, each input rotated
    by the previous output so nothing hoists."""

    def run(dx, dy, dz):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(ROUNDS):
            d = Vec3(dx, dy, dz)
            c = fn(d)
            acc = acc + c.x
            # rotate directions by a value-dependent phase
            s = 0.1 * (c.x - c.y)
            dx2 = dx + s * dz
            dz = dz - s * dx
            dx = dx2
            n = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            dx, dy, dz = dx / n, dy / n, dz / n
        return acc

    return jax.jit(run)


def _time(fn, args, iters=5):
    out = fn(*args)
    _ = float(np.asarray(out[:1]).sum())
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out[:1]).sum())
        best = min(best, time.perf_counter() - t0)
    return best / ROUNDS


def main():
    rng = np.random.default_rng(5)
    img = np.zeros((H, W, 3), np.float32)
    img[:] = synthetic_equirect(64).repeat(H // 64, 0).repeat(W // 128, 1)
    image = jnp.asarray(img)
    packed = jnp.asarray(pack_bilinear(img))
    d = rng.normal(size=(3, N)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    dx, dy, dz = (jnp.asarray(d[i]) for i in range(3))

    t4 = _time(_chain(lambda v: sample_equirect_v(image, v)), (dx, dy, dz))
    print(f"four-take bilinear: {t4 * 1e3:.1f} ms/eval")
    tp = _time(_chain(lambda v: sample_equirect_packed_v(H, W, packed, v)),
               (dx, dy, dz))
    print(f"packed one-take   : {tp * 1e3:.1f} ms/eval  "
          f"({t4 / tp:.2f}x)")
    snap = jnp.asarray(make_snap_table(img))
    ts = _time(_chain(lambda v: sample_equirect_snap_v(H, W, snap, v)),
               (dx, dy, dz))
    print(f"snap one-take     : {ts * 1e3:.1f} ms/eval  "
          f"({t4 / ts:.2f}x)")

    # raw take width micro at identical addresses
    idx0 = jnp.asarray(rng.integers(0, H * W, (N,)), jnp.int32)
    for width in (1, 3, 12):
        tab = jnp.asarray(rng.uniform(0, 1, (H * W, width)), jnp.float32)

        def run(idx, tab=tab, width=width):
            acc = jnp.zeros((N,), jnp.float32)
            for _ in range(ROUNDS):
                got = jnp.take(tab, idx, axis=0)
                acc = acc + got[:, 0]
                idx = (idx + got[:, width - 1].astype(jnp.int32) + 1) % (H * W)
            return acc

        t = _time(jax.jit(run), (idx0,))
        print(f"raw take (N,{width:2d})   : {t * 1e3:.1f} ms/eval")


if __name__ == "__main__":
    main()
