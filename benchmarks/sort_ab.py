"""A/B: XLA lax.sort vs the VMEM Pallas bitonic sort (ops/pallas_sort) on
the ray-sort workload shape: 16 operands, 196608 lanes, 8192-lane chunks.

Run ON THE TPU from the repo root: python -m benchmarks.sort_ab [n_ops]
"""
import sys
import time

import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

import jax
import jax.numpy as jnp

N = 196608
CHUNK = 8192
N_OPS = int(sys.argv[1]) if len(sys.argv) > 1 else 15


def time_fn(f, args, iters=30):
    r = f(*args)
    jax.block_until_ready(r)
    _ = float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[:1].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[:1].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(3)
    key = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    ops = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
           for _ in range(N_OPS - 1)]
    ops.append(jnp.asarray(rng.integers(0, 7, N).astype(np.int32)))

    def lax_sort(key, *ops):
        k2 = key.reshape(-1, CHUNK)
        lane = jnp.arange(N, dtype=jnp.int32).reshape(-1, CHUNK)
        o = (k2, lane) + tuple(a.reshape(-1, CHUNK) for a in ops)
        return jax.lax.sort(o, dimension=1, num_keys=1)

    def pallas_sort_f(key, *ops):
        from spt_tpu.ops import pallas_sort

        lane = jnp.arange(N, dtype=jnp.int32)
        return pallas_sort.sort_chunks(key, [lane] + list(ops), CHUNK)

    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    if which in ("both", "lax"):
        t = time_fn(jax.jit(lax_sort), [key] + ops)
        print(f"lax.sort    {N_OPS + 1} operands chunk={CHUNK}: {t:6.2f} ms")
    if which in ("both", "pallas"):
        t = time_fn(jax.jit(pallas_sort_f), [key] + ops)
        print(f"pallas sort {N_OPS + 1} operands chunk={CHUNK}: {t:6.2f} ms")
        # correctness vs numpy per chunk
        sk, out = jax.jit(pallas_sort_f)(key, *ops)
        sk = np.asarray(sk)
        kk = np.asarray(key)
        for c in range(N // CHUNK):
            s = slice(c * CHUNK, (c + 1) * CHUNK)
            np.testing.assert_array_equal(np.sort(kk[s]), sk[s])
        print("pallas sort output verified vs numpy")


if __name__ == "__main__":
    main()
