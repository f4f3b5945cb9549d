"""Micro-A/B of the sorted-mesh-frame building blocks on the real TPU.

Times, as standalone chained programs (32 iterations, one sync):
  sort13   - the full-width first sort (13 operands, 8192 chunks)
  sort2    - key + one packed operand only
  gather   - 32k-row take() of 10 planes from full width (the alternative
             to carrying state planes through the sort)
  sort32k  - the condensed sort (11 operands at 32k)

Usage: PYTHONPATH=. python benchmarks/pipe_ab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

N = 512 * 384
CHUNK = 8192
M = 32768
REP = 32

key0 = jnp.asarray(np.random.randint(0, 2**31, N, np.int64).astype(np.uint32))
planes = [jnp.asarray(np.random.rand(N).astype(np.float32)) for _ in range(12)]
idx = jnp.asarray(np.sort(np.random.choice(N, M, replace=False)).astype(np.int32))

from spt_tpu.ops import ray_sort


def chain(f, x):
    def body(i, x):
        return f(x)

    return jax.lax.fori_loop(0, REP, body, x)


@jax.jit
def sort13(key, planes):
    def f(args):
        key, planes = args
        _, out = ray_sort.sort_by_key(key, list(planes), CHUNK)
        return out[0].astype(jnp.uint32), out[1:] + [out[0]]

    return chain(f, (key, planes))


@jax.jit
def sort2(key, p0):
    def f(args):
        key, p0 = args
        _, out = ray_sort.sort_by_key(key, [p0], CHUNK)
        return out[0].astype(jnp.uint32), out[0]

    return chain(f, (key, p0))


@jax.jit
def gather10(idx, planes):
    def f(args):
        idx, planes = args
        outs = [jnp.take(p, idx, axis=0) for p in planes]
        s = sum(outs)
        return (idx + 1) % N, planes[1:] + [planes[0] + s.sum() * 0]

    return chain(f, (idx, planes[:10]))


@jax.jit
def sort32k(key, planes):
    def f(args):
        key, planes = args
        _, out = ray_sort.sort_by_key(key, list(planes), M)
        return out[0].astype(jnp.uint32), out[1:] + [out[0]]

    return chain(f, (key, planes))


def run(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0])[:1].sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0])[:1].sum())
        ts.append((time.perf_counter() - t0) / REP * 1e3)
    print(f"{name:9s} {min(ts):7.3f} ms/iter")


run("sort13", sort13, key0, planes)
run("sort2", sort2, key0, planes[0])
run("gather10", gather10, idx, planes)
run("sort32k", sort32k, key0[:M], [p[:M] for p in planes[:10]])
