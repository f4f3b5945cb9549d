"""Which in-kernel constructs does Mosaic actually compile on real TPU?

Round-4's instanced/streamed fused path was developed against CPU interpret
mode while the TPU tunnel was down; first hardware compile failed with
"Broadcast in both sublanes and lanes" out of the B=1 dynamically-sliced
_box_flags call (pallas_inst.py:148, pallas_stream.py:135).  This script
compiles one tiny kernel per suspect construct so the fix targets exactly
what the hardware rejects:

  A. dyn-sliced (1,3) VMEM load -> (1,8,128) broadcast   [the known failure]
  B. SMEM scalar read (dynamic row) -> vector broadcast  [the intended fix]
  C. dynamic scalar element read from VMEM (inst_tab[i, c])
  D. dynamic leading-dim read of a 3-D VMEM ref (tri_pack[i])

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/repro_mosaic_constructs.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 8, 128


def _try(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"{name}: OK   (sum={float(np.sum(out)):.3f})")
        return True
    except Exception as e:  # noqa: BLE001 - report and continue
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


# ---------------------------------------------------------------- A
def _kern_a(tab, x, o):
    i = (x[0, 0] > 0.0).astype(jnp.int32)  # dynamic-ish index
    row = tab[pl.ds(i, 1), :]              # (1, 3) VMEM vector load
    v = row[:, 0:1].reshape(1, 1, 1)       # (1,1,1)
    o[:] = (v + x[:].reshape(1, S, L)).reshape(S, L)


def case_a():
    tab = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    x = jnp.ones((S, L), jnp.float32)
    return pl.pallas_call(
        _kern_a,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
    )(tab, x)


# ---------------------------------------------------------------- B
def _kern_b(tab, x, o):
    i = (x[0, 0] > 0.0).astype(jnp.int32)
    v = tab[i, 0]                          # SMEM scalar read, dynamic row
    o[:] = v + x[:]


def case_b():
    tab = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    x = jnp.ones((S, L), jnp.float32)
    return pl.pallas_call(
        _kern_b,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
    )(tab, x)


# ---------------------------------------------------------------- C
def _kern_c(tab, x, o):
    i = (x[0, 0] > 0.0).astype(jnp.int32)
    v = tab[i, 1]                          # VMEM scalar element, dynamic row
    o[:] = v + x[:]


def case_c():
    tab = jnp.arange(64, dtype=jnp.float32).reshape(4, 16)
    x = jnp.ones((S, L), jnp.float32)
    return pl.pallas_call(
        _kern_c,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
    )(tab, x)


# ---------------------------------------------------------------- D
def _kern_d(pack, x, o):
    i = (x[0, 0] > 0.0).astype(jnp.int32)
    blk = pack[i]                          # (8, 128) from (4, 8, 128)
    o[:] = blk + x[:]


def case_d():
    pack = jnp.arange(4 * S * L, dtype=jnp.float32).reshape(4, S, L)
    x = jnp.ones((S, L), jnp.float32)
    return pl.pallas_call(
        _kern_d,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
    )(pack, x)


if __name__ == "__main__":
    print("devices:", jax.devices())
    _try("A dyn-slice (1,3) -> both-dim broadcast", case_a)
    _try("B SMEM scalar -> vector broadcast      ", case_b)
    _try("C VMEM dynamic scalar element          ", case_c)
    _try("D VMEM dynamic leading-dim 3-D read    ", case_d)
