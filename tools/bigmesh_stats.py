"""Open-count statistics for the bigmesh (4x4 chair grid) mesh tiers.

bench.py --scene bigmesh measured the instanced tier at 142.6 ms/frame with
benchmarks/bigmesh_stages.py attributing +56 ms to bounce 1 alone — 3x the
whole primary bounce.  This tool explains where that time goes WITHOUT
another 10-minute Mosaic compile: numpy replicas of exactly the flag passes
the kernels run (pallas_inst.inst_closest_tile, pallas_stream
closest-hit), over the production ray sets:

  bounce0: camera-order primary rays (the kernels trace these unsorted)
  bounce1: cosine-scatter from the real primary hits, production sort key
           (ray_sort.sort_key, 8192-lane chunked argsort), live lanes
           packed (the condense approximation)

Per (8, 128) = 1024-lane subtile it counts
  instanced: flagged TLAS instances, and per flagged instance the flagged
             BLAS clusters (= block-test opens, 56.6 us each on hardware —
             tools/spike_perlane.py)
  stream:    flagged supers, and per flagged super the flagged clusters

with tmax = inf, i.e. the kernels' *flag-time* counts (the shrinking bound
only prunes during opens, and the chair-scale recheck experiment showed it
prunes little at tile granularity — docs/DESIGN.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/bigmesh_stats.py        # TPU for the primary hits only
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 1024
OPEN_US = 56.6          # measured K=64 block test on an (8,128) subtile
W, H = 512, 384


def slab_counts(lo, hi, o, inv, tile=LANES):
    """Per-`tile` flagged-box counts: (n_tiles,) ints.  lo/hi (B, 3);
    o/inv (N, 3)."""
    n = o.shape[0]
    out = []
    for i in range(0, n, tile):
        ot, it = o[i:i + tile], inv[i:i + tile]
        t0 = (lo[:, None] - ot[None]) * it[None]      # (B, T, 3)
        t1 = (hi[:, None] - ot[None]) * it[None]
        tnear = np.minimum(t0, t1).max(-1)
        tfar = np.maximum(t0, t1).min(-1)
        out.append(int((np.maximum(tnear, 1e-4) <= tfar).any(-1).sum()))
    return np.array(out)


def inv_of(d):
    return np.where(np.abs(d) > 1e-20, 1.0 / d,
                    np.where(d >= 0, 1e30, -1e30)).astype(np.float32)


def inst_stats(ia, o, d, label):
    """Instanced-tier flag counts: TLAS opens and, per opened instance,
    BLAS cluster opens (rays transformed into object space first)."""
    inst_lo = np.asarray(ia.inst_lo)
    inst_hi = np.asarray(ia.inst_hi)
    tab = np.asarray(ia.inst)
    blas_lo = np.asarray(ia.blas_lo)
    blas_hi = np.asarray(ia.blas_hi)
    n = o.shape[0]
    n_tiles = n // LANES
    iopens = np.zeros(n_tiles, np.int64)
    copens = np.zeros(n_tiles, np.int64)
    inv = inv_of(d)
    for t in range(n_tiles):
        sl = slice(t * LANES, (t + 1) * LANES)
        ot, dt, it = o[sl], d[sl], inv[sl]
        t0 = (inst_lo[:, None] - ot[None]) * it[None]
        t1 = (inst_hi[:, None] - ot[None]) * it[None]
        tnear = np.minimum(t0, t1).max(-1)
        tfar = np.maximum(t0, t1).min(-1)
        flagged = (np.maximum(tnear, 1e-4) <= tfar).any(-1)
        iopens[t] = int(flagged.sum())
        for i in np.nonzero(flagged)[0]:
            r = tab[i, :9].reshape(3, 3)
            tr = tab[i, 9:12]
            mesh = int(tab[i, 12])
            oo = ot @ r.T + tr
            dd = dt @ r.T
            iv = inv_of(dd)
            t0 = (blas_lo[mesh][:, None] - oo[None]) * iv[None]
            t1 = (blas_hi[mesh][:, None] - oo[None]) * iv[None]
            tnear = np.minimum(t0, t1).max(-1)
            tfar = np.maximum(t0, t1).min(-1)
            copens[t] += int((np.maximum(tnear, 1e-4) <= tfar).any(-1).sum())
    model = copens.sum() * OPEN_US / 1e3
    print(f"{label} instanced: tiles {n_tiles}, "
          f"inst opens/tile avg {iopens.mean():.1f}, "
          f"cluster opens/tile avg {copens.mean():.1f} "
          f"(total {copens.sum()}), "
          f"open cost model {model:.1f} ms/pass")
    return copens.sum()


def stream_stats(a, o, d, label):
    sup_lo, sup_hi = np.asarray(a.sup_lo), np.asarray(a.sup_hi)
    cl_lo, cl_hi = np.asarray(a.cluster_lo), np.asarray(a.cluster_hi)
    fan = cl_lo.shape[0] // sup_lo.shape[0]
    n = o.shape[0]
    n_tiles = n // LANES
    sopens = np.zeros(n_tiles, np.int64)
    copens = np.zeros(n_tiles, np.int64)
    inv = inv_of(d)
    for t in range(n_tiles):
        sl = slice(t * LANES, (t + 1) * LANES)
        ot, it = o[sl], inv[sl]
        t0 = (sup_lo[:, None] - ot[None]) * it[None]
        t1 = (sup_hi[:, None] - ot[None]) * it[None]
        tnear = np.minimum(t0, t1).max(-1)
        tfar = np.maximum(t0, t1).min(-1)
        flagged = (np.maximum(tnear, 1e-4) <= tfar).any(-1)
        sopens[t] = int(flagged.sum())
        for g in np.nonzero(flagged)[0]:
            lo = cl_lo[g * fan:(g + 1) * fan]
            hi = cl_hi[g * fan:(g + 1) * fan]
            t0 = (lo[:, None] - ot[None]) * it[None]
            t1 = (hi[:, None] - ot[None]) * it[None]
            tnear = np.minimum(t0, t1).max(-1)
            tfar = np.maximum(t0, t1).min(-1)
            copens[t] += int((np.maximum(tnear, 1e-4) <= tfar).any(-1).sum())
    model = copens.sum() * OPEN_US / 1e3
    print(f"{label} stream   : tiles {n_tiles}, "
          f"super opens/tile avg {sopens.mean():.1f}, "
          f"cluster opens/tile avg {copens.mean():.1f} "
          f"(total {copens.sum()}), "
          f"open cost model {model:.1f} ms/pass")
    return copens.sum()


def prepare():
    """Build the bigmesh scene and its production ray sets.

    Returns (scene, o0, d0, o1, d1, t1) — primary rays in camera order and
    the bounce-1 cosine-scatter set sorted + condensed exactly as the
    pipeline would (live lanes only, padded to whole tiles), plus each
    bounce-1 ray's TRUE closest t (the oracle bound for pruning studies).
    One TPU pass for the primary hits and one for the bounce-1 ground
    truth; everything else is numpy.
    """
    import jax.numpy as jnp

    from benchmarks.stream_ab import build_chair_grid, primary_rays
    from spt_tpu.ops import intersect as isect
    from spt_tpu.ops import ray_sort
    from spt_tpu.ops.vec3 import Vec3
    from spt_tpu.scene.flatten import flatten_scene

    desc, center, radius = build_chair_grid()
    scene = flatten_scene(desc)
    a = scene.accel

    cam, cfg, o, d = primary_rays(center, radius, W, H)
    hv = isect.intersect_v(scene, o, d, 1e-4)
    t = np.asarray(hv.t)
    alive = np.isfinite(t)
    print(f"primary hit rate {alive.mean():.2f}")

    o_np = np.stack([np.asarray(c) for c in (o.x, o.y, o.z)], 1)
    d_np = np.stack([np.asarray(c) for c in (d.x, d.y, d.z)], 1)

    # bounce-1: cosine scatter around the (normalized, faceforwarded)
    # normal at each hit; dead lanes keep their old ray (the kernels mask
    # them; tmax=inf here so they still count — mirrors the masked tracer)
    nrm = np.stack([np.asarray(c) for c in
                    (hv.normal.x, hv.normal.y, hv.normal.z)], 1)
    nn = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    nn = np.where((nn * d_np).sum(1, keepdims=True) > 0, -nn, nn)
    p = o_np + np.where(alive[:, None], t[:, None] * d_np, 0)
    rng = np.random.default_rng(7)
    u1, u2 = rng.random(len(t)), rng.random(len(t))
    r_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(nn, np.where(np.abs(nn[:, :1]) < 0.9,
                                 [1.0, 0, 0], [0, 1.0, 0]))
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nn, tang)
    d1 = (tang * (r_ * np.cos(phi))[:, None]
          + bit * (r_ * np.sin(phi))[:, None]
          + nn * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    o1 = (p + 1e-3 * d1).astype(np.float32)

    # production sort (octant|morton key, 8192-chunk argsort), then the
    # condense approximation: live lanes only, packed in sorted order
    lo = np.asarray(a.cluster_lo).min(0)
    hi = np.asarray(a.cluster_hi).max(0)
    inv_ext = (1.0 / np.maximum(hi - lo, 1e-9)).astype(np.float32)
    key = np.asarray(ray_sort.sort_key(
        Vec3(*(jnp.asarray(d1[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(o1[:, i]) for i in range(3))),
        jnp.asarray(alive), jnp.asarray(lo.astype(np.float32)),
        jnp.asarray(inv_ext)))
    chunk = 8192
    order = np.argsort(key.reshape(-1, chunk), axis=1, kind="stable")
    order = (order + np.arange(0, len(t), chunk)[:, None]).reshape(-1)
    o1s, d1s, alive_s = o1[order], d1[order], alive[order]
    keep = np.nonzero(alive_s)[0]
    pad = (-len(keep)) % LANES
    keep = np.concatenate([keep, np.repeat(keep[-1:], pad)])
    print(f"bounce1 live {alive.sum()} -> {len(keep) // LANES} tiles "
          f"(condensed)")
    o1c, d1c = o1s[keep], d1s[keep]

    hv1 = isect.intersect_v(scene, Vec3(*(jnp.asarray(o1c[:, i])
                                          for i in range(3))),
                            Vec3(*(jnp.asarray(d1c[:, i])
                                   for i in range(3))), 1e-4)
    t1 = np.asarray(hv1.t)
    print(f"bounce1 hit rate {np.isfinite(t1).mean():.2f}")
    return scene, o_np, d_np, o1c, d1c, t1


def main():
    scene, o_np, d_np, o1c, d1c, t1 = prepare()
    a, ia = scene.accel, scene.inst
    print(f"instanced built: {ia is not None}")
    inst_stats(ia, o_np, d_np, "bounce0")
    stream_stats(a, o_np, d_np, "bounce0")
    inst_stats(ia, o1c, d1c, "bounce1")
    stream_stats(a, o1c, d1c, "bounce1")


if __name__ == "__main__":
    main()
