"""True in-program cost of the ray sort (dispatch/sync excluded).

sort_ab times one dispatch per call, so its numbers sit on the ~2-4 ms
relay-dispatch floor; here the sort runs as an R-deep chain inside ONE jit
(carry-dependent so nothing hoists) and the cost is (t(R=9) - t(R=1)) / 8.

Run ON THE TPU from the repo root: python -m tools.bench_sort_real [chunk]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

from spt_tpu.ops import pallas_sort

N = 196608
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 8192


def diff_time(n_ops, chunk):
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    ops0 = [jnp.asarray(rng.random(N, dtype=np.float32))
            for _ in range(n_ops)]

    def chain(r):
        @jax.jit
        def f(key, ops):
            def body(i, carry):
                key, ops = carry
                # mix the iteration in so levels cannot collapse
                key = key ^ i.astype(jnp.uint32)
                key, ops = pallas_sort.sort_chunks(key, ops, chunk)
                return key, ops

            return jax.lax.fori_loop(0, r, body, (key, ops))

        return f

    res = {}
    for r in (1, 9):
        f = chain(r)
        out = f(key0, ops0)
        jax.block_until_ready(out)
        _ = float(np.asarray(out[0][:1]).sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(key0, ops0)
            _ = float(np.asarray(out[0][:1]).sum())
            ts.append(time.perf_counter() - t0)
        res[r] = float(np.median(ts))
    return (res[9] - res[1]) / 8 * 1e3


for n_ops in (15, 3, 1):
    print(f"chunk={CHUNK} ops={n_ops}: {diff_time(n_ops, CHUNK):6.2f} ms",
          flush=True)
