"""Per-lane traversal spike: can `tpu.dynamic_gather` beat the block test?

The chair floor analysis (docs/DESIGN.md) says ~80 % of the frame is
cluster opens, bound by the TILE-UNION visit set (~70 of 96 clusters per
1024-lane subtile) while the per-LANE median visit set is ~6.8 — a ~10x
gap IF lanes could traverse independently.  The texture sampler proves
per-lane gathers exist (`pallas_bounce._gather_rc`: composed
lane+sublane `dynamic_gather` on (8, 128) tiles), so "the machine doesn't
have it" is not an argument.  This spike settles it with numbers:

A. measure the per-fetch cost of the composed gather: deliver one f32
   plane (one triangle attribute) to every lane of an (8, 128) output
   tile from a T-tile VMEM table, per-lane arbitrary indices — the
   primitive a per-lane triangle fetch decomposes into (one pass per
   DISTINCT (8, 128) source tile, as the texture sampler does per
   distinct texel tile);
B. measure the block-test baseline: one whole-cluster (K=64)
   Moller-Trumbore open against the same subtile (pallas_trace's
   tri_block_min);
C. arithmetic on the chair's measured visit statistics: a per-lane
   scheme must fetch 9 planes (v0|e1|e2) x mean-6.8-clusters x K tris
   through (A)-cost gathers spread over ceil(6144/1024) = 6 source
   tiles, vs ~70 union opens at (B) cost.

Run ON THE TPU from the repo root:
    PYTHONPATH=.:/root/.axon_site python tools/spike_perlane.py
Writes the measured ns and the verdict arithmetic to stdout; the result
belongs in docs/DESIGN.md ("where the chair frame's time actually goes").
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

LANES = 128
S = 8                 # output tile sublanes
N_TILES = 6           # source tiles: ceil(6144 tris / 1024) per f32 plane
K = 64

# chair subtile statistics (measured round 3, docs/DESIGN.md)
UNION_OPENS = 70.0    # mean distinct clusters per 1024-lane subtile
LANE_VISITS = 6.8     # mean per-lane visit set
PLANES = 9            # v0|e1|e2 needed per Moller-Trumbore test


def _gather_rc(tile, r, c, s, l):
    """pallas_bounce._gather_rc inlined (kernel-local copy so the spike
    stands alone): tile[r[i,j], c[i,j]] per output lane."""
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, l), 0)
    acc = jnp.zeros((s, l), jnp.float32)
    for i in range(s):
        c_b = jnp.broadcast_to(c[i:i + 1], (8, l))
        r_b = jnp.broadcast_to(r[i:i + 1], (8, l))
        h = jnp.take_along_axis(tile, c_b, axis=1)
        g = jnp.take_along_axis(h, r_b, axis=0)
        acc = jnp.where(iota_s == i, jnp.broadcast_to(g[0:1], (s, l)), acc)
    return acc


def _gather_kernel(reps, idx_ref, table_ref, out_ref):
    """reps rounds of: fetch one f32 value per lane from the (N_TILES*8,
    128) table at per-lane flat indices (the per-lane triangle-fetch
    primitive).  Each round visits every source tile (worst-case distinct
    set; the chair's bounce rays are nearly that) and feeds its result
    into the next round's indices so nothing hoists."""
    idx = idx_ref[:]
    acc = jnp.zeros((S, LANES), jnp.float32)
    n_slots = N_TILES * 1024
    for _ in range(reps):
        q = idx // 1024
        r = (idx // LANES) % 8
        c = idx % LANES
        got = jnp.zeros((S, LANES), jnp.float32)
        for t in range(N_TILES):
            tile = table_ref[pl.ds(t * 8, 8), :]
            g = _gather_rc(tile, r, c, S, LANES)
            got = jnp.where(q == t, g, got)
        acc = acc + got
        # next indices depend on the fetched values (dependence chain)
        idx = (idx + got.astype(jnp.int32) + 1) % n_slots
    out_ref[:] = acc


def _block_kernel(reps, ox, oy, oz, dx, dy, dz, tmaxr, pack_ref, out_ref):
    """reps whole-cluster block tests (the current open cost), chained."""
    from spt_tpu.ops.pallas_trace import tri_block_min
    from spt_tpu.ops.vec3 import Vec3

    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    s, l = o.x.shape
    o3 = (o.x.reshape(1, s, l), o.y.reshape(1, s, l), o.z.reshape(1, s, l))
    d3 = (d.x.reshape(1, s, l), d.y.reshape(1, s, l), d.z.reshape(1, s, l))
    tmax3 = tmaxr[:].reshape(1, s, l)
    best = jnp.full((s, l), 1e30)
    for i in range(reps):
        tm, _ = tri_block_min(pack_ref[i % pack_ref.shape[0]], K, s, l,
                              o3, d3, np.float32(1e-4), tmax3, False)
        best = jnp.minimum(best, tm + best * 0.0)  # chain dependence
    out_ref[:] = best


def _time(fn, *args, iters=5):
    fn(*args).block_until_ready()
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


INTERPRET = jax.devices()[0].platform == "cpu"  # CPU smoke only


def main():
    smoke = "--smoke" in sys.argv  # CPU/interpret syntax check: tiny reps
    r_lo, r_hi = (1, 3) if smoke else (8, 72)
    span = r_hi - r_lo
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.uniform(0, 3, (N_TILES * 8, LANES)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, N_TILES * 1024, (S, LANES)), jnp.int32)

    def gather_prog(reps):
        return pl.pallas_call(
            functools.partial(_gather_kernel, reps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.float32),
            interpret=INTERPRET,
        )

    lo = _time(jax.jit(lambda i, t: gather_prog(r_lo)(i, t)), idx0, table)
    hi = _time(jax.jit(lambda i, t: gather_prog(r_hi)(i, t)), idx0, table)
    per_fetch = (hi - lo) / span
    print(f"A. per-lane fetch (1 plane, {N_TILES} source tiles): "
          f"{per_fetch * 1e9:.0f} ns")

    pack = jnp.asarray(rng.uniform(-1, 1, (8, K, 24)), jnp.float32)
    o = rng.uniform(-3, 3, (3, S, LANES)).astype(np.float32)
    d = rng.normal(size=(3, S, LANES)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    args = [jnp.asarray(o[0]), jnp.asarray(o[1]), jnp.asarray(o[2]),
            jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]),
            jnp.full((S, LANES), 1e30, jnp.float32), pack]

    def block_prog(reps):
        return pl.pallas_call(
            functools.partial(_block_kernel, reps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.float32),
            interpret=INTERPRET,
        )

    lo_b = _time(jax.jit(lambda *a: block_prog(r_lo)(*a)), *args)
    hi_b = _time(jax.jit(lambda *a: block_prog(r_hi)(*a)), *args)
    per_open = (hi_b - lo_b) / span
    print(f"B. block-test open (K={K}, 8x128 subtile): "
          f"{per_open * 1e6:.2f} us")

    # C. the comparison on chair statistics.  NOTE the subtile scale
    # difference: the block test covers 1024 lanes per open; the gather
    # primitive delivers to 1024 lanes too (one (8,128) tile) — but a
    # per-lane scheme needs LANE_VISITS * K tri-tests per lane, each
    # needing PLANES plane-fetches.
    union_cost = UNION_OPENS * per_open
    perlane_fetches = LANE_VISITS * K * PLANES
    perlane_cost = perlane_fetches * per_fetch
    print(f"C. per-subtile trace cost, chair statistics:")
    print(f"   union block tests: {UNION_OPENS:.0f} opens x "
          f"{per_open * 1e6:.2f} us = {union_cost * 1e6:.1f} us")
    print(f"   per-lane gathers:  {LANE_VISITS} visits x {K} tris x "
          f"{PLANES} planes = {perlane_fetches:.0f} fetches x "
          f"{per_fetch * 1e9:.0f} ns = {perlane_cost * 1e6:.1f} us")
    print(f"   verdict: per-lane/union = {perlane_cost / union_cost:.2f}x "
          f"({'WINS' if perlane_cost < union_cost else 'LOSES'}; "
          f"M-T math for the per-lane scheme not yet counted)")


if __name__ == "__main__":
    main()
