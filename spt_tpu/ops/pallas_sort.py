"""Chunked multi-operand bitonic sort as a Pallas TPU kernel.

The wavefront ray sort (ops/ray_sort) reorders ~15 lane planes by a uint32
key within fixed chunks.  XLA's variadic `lax.sort` on TPU executes the
compare-exchange network as a pass per level over the full arrays — for an
8192-lane chunk that is 91 levels, each reading and writing every operand
through HBM: ~1 GB of traffic to move 12 MB of data.  This kernel runs the
same bitonic network entirely in VMEM: each grid step owns one chunk, loads
every operand once, runs the 91 levels as register/VMEM ops, and stores
once.  HBM traffic drops to exactly one read + one write of the data.

The network partner exchange (j = i ^ stride) maps onto the TPU's layout
cheaply: for strides < 128 it is a lane-dimension rotate pair + select, for
strides >= 128 a sublane-dimension rotate pair + select — no gathers, which
on TPU serialize (docs/DESIGN.md).  All masks derive from iota constants, so
each of the 91 levels is ~6 vector ops plus 3 per operand.

Bitonic order is NOT stable, but the ray sort never needs stability: lane
identity rides as an operand, ties (dead lanes, equal octants) may land in
any order, and the inverse sort keyed on lane id (all distinct) restores
pixel order exactly (ray_sort.unsort_by_lane contract).

Sorts ascending uint32 keys (dead lanes carry 0xFFFFFFFF and land last).
Operands are f32/i32/u32 planes of the same (N,) shape as the key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _roll(x, shift, axis):
    """Static-shift rotate.  pltpu.roll where available; jnp.roll traces the
    same semantics in interpreter mode and on CPU."""
    try:
        return pltpu.roll(x, shift=shift, axis=axis)
    except Exception:
        return jnp.roll(x, shift, axis=axis)


def _partner(x, stride, rows, axis_off=0):
    """value at index i ^ stride for each element of a (..., rows, 128)
    array (`axis_off` leading axes are untouched operand stacking).

    For stride < 128 the partner is in the same sublane row (lane rotate);
    for stride >= 128 in the same lane column (sublane rotate).  Where the
    stride bit of the index is clear, the partner sits `stride` ahead; where
    set, `stride` behind — two rotates and a select, no gathers.
    """
    nd = x.ndim
    if stride < LANES:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, nd - 1)
        low = (col & stride) == 0
        return jnp.where(low, _roll(x, -stride, nd - 1),
                         _roll(x, stride, nd - 1))
    rstride = stride // LANES
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, nd - 2)
    low = (row & rstride) == 0
    return jnp.where(low, _roll(x, -rstride, nd - 2),
                     _roll(x, rstride, nd - 2))


def _sort_kernel(chunk, n_ops, key_ref, *op_refs_and_outs):
    """One chunk, whole bitonic network in VMEM.  Refs are (rows, 128); the
    operands ride as ONE bit-cast uint32 stack (n_ops, rows, 128) so each of
    the ~91 network levels is a handful of wide vector ops rather than ~3
    narrow ops per operand (selects never look at the bits, so any dtype
    survives the ride)."""
    in_refs = op_refs_and_outs[:n_ops]
    key_out = op_refs_and_outs[n_ops]
    out_refs = op_refs_and_outs[n_ops + 1:]
    rows = chunk // LANES

    # uint32 keys compared as sign-flipped int32 (order-preserving bijection)
    # — unsigned vector compares are spotty in Mosaic.
    key = (key_ref[:] ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    ops = jnp.stack([pltpu.bitcast(r[:], jnp.uint32) for r in in_refs])

    idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))

    size = 2
    while size <= chunk:
        stride = size // 2
        while stride >= 1:
            pkey = _partner(key, stride, rows)
            # ascending block <=> the `size` bit of the index is clear;
            # take-min element <=> the `stride` bit is clear.  The element
            # keeps the min of (self, partner) when those agree.
            take_min = ((idx & stride) == 0) == ((idx & size) == 0)
            # swap = take_min ? (pkey < key) : (pkey > key), written with
            # logical ops — Mosaic cannot lower a select over i1 vectors.
            swap = (take_min == (pkey < key)) & (pkey != key)
            key = jnp.where(swap, pkey, key)
            ops = jnp.where(swap[None], _partner(ops, stride, rows), ops)
            stride //= 2
        size *= 2

    key_out[:] = (key ^ jnp.int32(-0x80000000)).astype(jnp.uint32)
    for i, r in enumerate(out_refs):
        r[:] = pltpu.bitcast(ops[i], r.dtype)


def sort_chunks(key, operands, chunk: int, interpret: bool = False):
    """Sort (key, *operands) ascending within `chunk`-lane chunks.

    Same contract as the lax.sort path in ray_sort.sort_by_key (minus
    stability, which no caller relies on).  Requires chunk to be a
    power-of-two multiple of 128.  Returns (sorted_key, sorted_operands).
    """
    n = key.shape[0]
    assert n % chunk == 0 and chunk % LANES == 0
    assert chunk & (chunk - 1) == 0, "bitonic sort needs a power-of-two chunk"
    rows = chunk // LANES
    n_chunks = n // chunk
    total_rows = n_chunks * rows

    def r2(a):
        return a.reshape(total_rows, LANES)

    block = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    n_ops = len(operands)
    outs = pl.pallas_call(
        functools.partial(_sort_kernel, chunk, n_ops),
        grid=(n_chunks,),
        in_specs=[block] * (1 + n_ops),
        out_specs=[block] * (1 + n_ops),
        out_shape=[jax.ShapeDtypeStruct((total_rows, LANES), key.dtype)]
        + [jax.ShapeDtypeStruct((total_rows, LANES), a.dtype)
           for a in operands],
        interpret=interpret,
    )(r2(key), *[r2(a) for a in operands])
    return outs[0].reshape(n), [a.reshape(n) for a in outs[1:]]
