"""Probe: which transcendentals Mosaic lowers inside a Pallas TPU kernel.

The per-bounce in-kernel env sampler needs equirect tap setup
(env._equirect_taps: arctan2 + arccos) INSIDE the fused kernels.  This
probes each candidate op in a minimal kernel and prints OK/FAIL, plus the
max error of the polynomial fallbacks (ops/kernel_trig) against numpy.

Run ON THE TPU: PYTHONPATH=.:/root/.axon_site python tools/probe_trig.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()


def run_kernel(fn, *args):
    def kern(*refs):
        ins, out = refs[:-1], refs[-1]
        out[:] = fn(*(r[:] for r in ins))

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(args[0].shape, jnp.float32),
    )(*args)


def probe(name, fn, *args):
    try:
        out = np.asarray(run_kernel(fn, *args))
        print(f"{name:>24}: OK   sample={out.reshape(-1)[:3]}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name:>24}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 128)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (8, 128)).astype(np.float32))

    probe("jnp.arctan2", lambda a, b: jnp.arctan2(a, b), y, x)
    probe("jnp.arccos", lambda a: jnp.arccos(jnp.clip(a, -1, 1)), x)
    probe("jnp.arctan", lambda a: jnp.arctan(a), x)
    probe("jnp.arcsin", lambda a: jnp.arcsin(jnp.clip(a, -1, 1)), x)
    probe("lax.atan2", lambda a, b: jax.lax.atan2(a, b), y, x)
    probe("jnp.floor", lambda a: jnp.floor(a * 7.3), x)
    probe("jnp.mod_int", lambda a: (a * 100).astype(jnp.int32).astype(
        jnp.float32) % 16.0, x)

    # fallback accuracy (only meaningful if the natives FAIL)
    try:
        from spt_tpu.ops.kernel_trig import atan2_poly, acos_poly

        out = probe("kernel_trig.atan2_poly", atan2_poly, y, x)
        if out is not None:
            ref = np.arctan2(np.asarray(y), np.asarray(x))
            print(f"{'atan2_poly max err':>24}: {np.abs(out - ref).max():.3e}")
        out = probe("kernel_trig.acos_poly", acos_poly, x)
        if out is not None:
            ref = np.arccos(np.clip(np.asarray(x), -1, 1))
            print(f"{'acos_poly max err':>24}: {np.abs(out - ref).max():.3e}")
    except ImportError:
        print("(ops/kernel_trig not present yet)")


if __name__ == "__main__":
    sys.exit(main())
